"""Full-size train-step smoke for the r5 archs on real TPU hardware.

Measured (v5e 1 chip, bf16 base + rank-16 LoRA + adamw8bit, warm cache):
  pixart   0.61B @1024px (4096 tok): 557 ms/step (1.80 steps/s)
  auraflow 6.86B @512px  (1024 tok): 358 ms/step (2.79 steps/s)
                — @1024px the bf16 base OOMs one 16G chip by 2.4G
                  (quantize the base, like the reference does)
  cogview4 2.66B @512px  (1024 tok): 421 ms/step (2.38 steps/s)
                — @1024px misses by 202MB; int8 base fits easily

Usage: python scripts/smoke_new_archs.py auraflow|cogview4  (pixart variant
inline below). Proves the full-size configs compile and step end-to-end —
tiny-config tests cannot catch full-size-only breakage.
"""
import sys, time
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ai_toolkit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np
from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_jitted_train_step

def smoke(name, dit, tokens, txt, extra_apply, targets):
    t0 = time.time()
    params = jax.jit(lambda r: dit.init(r, tokens, txt, jnp.zeros((1,)), *extra_apply))(jax.random.key(0))["params"]
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{name}: init {n/1e9:.2f}B params {time.time()-t0:.0f}s", flush=True)
    lora = build_lora(params, LoRASpec(rank=16, alpha=16, target_patterns=targets), jax.random.key(1))
    def predict(variables, noisy, tt, cond):
        colls = {"params": variables["params"]}
        if "lora" in variables: colls["lora"] = variables["lora"]
        return dit.apply(colls, noisy, cond["txt"], tt, *extra_apply)
    tx = get_optimizer("adamw8bit", 1e-4)
    step = make_jitted_train_step(predict, FlowMatchSchedule(), TrainStepConfig(), tx)
    state = TrainState.create({"params": params}, {"lora": lora}, tx)
    batch = {"latents": tokens, "cond": {"txt": txt}}
    t0 = time.time()
    state, m = step(state, batch, jax.random.key(2)); l = float(m["loss"])
    print(f"{name}: compile+first {time.time()-t0:.0f}s loss={l:.4f}", flush=True)
    t0 = time.time()
    for _ in range(5):
        state, m = step(state, batch, jax.random.key(2)); l = float(m["loss"])
    dt = (time.time()-t0)/5
    print(f"{name} full-size train step: {dt*1000:.0f} ms/step -> {1/dt:.2f} steps/s", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else ""
if which not in ("auraflow", "cogview4", "pixart"):
    raise SystemExit("usage: smoke_new_archs.py auraflow|cogview4|pixart")
if which == "pixart":
    from ai_toolkit_tpu.models.pixart_dit import PixArtConfig, PixArtDiT, pixart_lora_targets
    cfg = PixArtConfig()
    dit = PixArtDiT(cfg)
    HP = 64  # 1024px -> 64x64 patches
    class PxWrap:
        def __init__(self, d): self.d = d
        def init(self, r, tok, txt, t, *a):
            return self.d.init(r, tok, txt, t, HP, HP, jnp.ones((1, 300)))
        def apply(self, colls, tok, txt, t, *a):
            out = self.d.apply(colls, tok, txt, t, HP, HP, jnp.ones((1, 300)))
            return out[..., :4 * cfg.in_channels]  # smoke: drop the sigma half
    smoke("pixart", PxWrap(dit),
          jnp.zeros((1, HP * HP, 4 * cfg.in_channels), jnp.bfloat16),
          jnp.zeros((1, 300, cfg.caption_dim), jnp.bfloat16),
          (), pixart_lora_targets())
    raise SystemExit(0)
if which == "auraflow":
    from ai_toolkit_tpu.models.auraflow_dit import AuraFlowConfig, AuraFlowDiT, auraflow_lora_targets
    cfg = AuraFlowConfig()  # 6.8B
    smoke("auraflow", AuraFlowDiT(cfg),
          jnp.zeros((1, 1024, 4*cfg.in_channels), jnp.bfloat16),
          jnp.zeros((1, 256, cfg.context_dim), jnp.bfloat16),
          (32, 32), auraflow_lora_targets())  # 512px: 6.8B bf16 + 1024px acts OOM a single 16G chip (quantize for 1024)
else:
    from ai_toolkit_tpu.models.cogview4_dit import CogView4Config, CogView4DiT, cogview4_lora_targets, cogview4_rope
    cfg = CogView4Config()
    ang = jnp.asarray(cogview4_rope(cfg, 32, 32))
    class CVWrap:
        def __init__(self, d): self.d = d
        def init(self, r, tok, txt, t, *a):
            return self.d.init(r, tok, txt, t, ang, jnp.zeros((1,2)), jnp.zeros((1,2)), jnp.zeros((1,2)))
        def apply(self, colls, tok, txt, t, *a):
            return self.d.apply(colls, tok, txt, t*1000.0, ang, jnp.full((1,2),1024.0), jnp.full((1,2),1024.0), jnp.zeros((1,2)))
    smoke("cogview4", CVWrap(CogView4DiT(cfg)),
          jnp.zeros((1, 1024, 4*cfg.in_channels), jnp.bfloat16),  # 512px (1024px misses by 202MB on one 16G chip)
          jnp.zeros((1, 224, cfg.text_embed_dim), jnp.bfloat16),
          (), cogview4_lora_targets())
