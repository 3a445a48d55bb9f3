"""Full-size VIDEO train-step benchmark on real TPU hardware.

The reference publishes no wan/ltx2 steps/s baseline; these are our measured
numbers for the standard video workloads (BaseSDTrainProcess video configs:
wan21 trains 81f @ 480x832, examples train_lora_wan21_14b.yaml).

Measured (v5e 1 chip, bf16 base + rank-16 LoRA + adamw8bit, warm cache):
  wan21_33f : 1382 ms/step -> 0.72 steps/s (23.9 trained frames/s)
  wan21_81f : 10756 ms/step -> 0.09 steps/s (7.5 trained frames/s)
              ~compute-bound: at 32k tokens the attention math alone is
              ~770 TFLOP/step (fwd+bwd+remat), a ~5s floor at v5e peak
  wan22_5b  : 3361 ms/step -> 0.30 steps/s (9.8 trained frames/s)
  wan21_81f_480p (32760 tok, pad+mask path): 15941 ms/step measured under
              concurrent bench load — proves the exact reference shape
              trains; expect ~11s quiet (same work as wan21_81f +3% tokens)
Both require the KV-streaming flash kernels (flash_attention_streamed) —
the resident kernels VMEM-OOM past ~8k tokens and the XLA fallback would
materialize multi-GB logits.

Workloads:
  wan21_33f : wan21-1.3B, 33 frames @ 512x512  -> latent [9, 64, 64],  9216 tok
  wan21_81f : wan21-1.3B, 81 frames @ 512x768  -> latent [21, 64, 96], 32256 tok
              (the reference's headline wan21 t2v length; 512x768 keeps the
              token count 128-divisible for the flash kernels — 480x832's
              32760 tokens are not, and the pallas path requires it)
  wan22_5b  : wan22-5B TI2V, 33 frames @ 512x512 (48-ch latents), 9216 tok

The UMT5 text tower is cached in real runs (latent/text caching), so the
step = DiT fwd+bwd + optimizer, same as bench.py's flux methodology.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ai_toolkit_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.models.wan_dit import (
    WanConfig,
    WanDiT,
    wan_lora_targets,
    wan_patchify,
    wan_position_ids,
)
from ai_toolkit_tpu.ops.rope import multi_axis_rope
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_jitted_train_step

WORKLOADS = {
    "wan21_33f": (WanConfig.wan21_1_3b, (9, 64, 64), 33, "512x512"),
    "wan21_81f": (WanConfig.wan21_1_3b, (21, 64, 96), 81, "512x768"),
    # the reference's EXACT headline shape: 32760 tokens, NOT 128-divisible
    # -> exercises the flash_attention_any pad+mask path at full scale
    "wan21_81f_480p": (WanConfig.wan21_1_3b, (21, 60, 104), 81, "480x832"),
    "wan22_5b": (WanConfig.wan22_5b, (9, 64, 64), 33, "512x512"),
}


def bench(name: str, iters: int = 5) -> float:
    cfg_fn, (t, h, w), frames, px = WORKLOADS[name]
    cfg = cfg_fn()
    dit = WanDiT(cfg)
    pt, ph, pw = cfg.patch_size
    n_tok = (t // pt) * (h // ph) * (w // pw)
    latents = jnp.zeros((1, t, h, w, cfg.in_channels), jnp.float32)
    tokens = wan_patchify(latents, cfg.patch_size)
    txt = jnp.zeros((1, 512, cfg.text_dim), jnp.float32)
    ids = wan_position_ids(t // pt, h // ph, w // pw)
    pe = multi_axis_rope(ids, list(cfg.axes_dim))

    t0 = time.time()
    params = jax.jit(
        lambda r: dit.init(r, tokens, txt, jnp.zeros((1,)), pe)
    )(jax.random.key(0))["params"]
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{name}: {n/1e9:.2f}B params, {frames}f @{px} -> {n_tok} tokens "
          f"(init {time.time()-t0:.0f}s)", flush=True)

    lora = build_lora(params, LoRASpec(rank=16, alpha=16,
                                       target_patterns=wan_lora_targets()),
                      jax.random.key(1))

    def predict(variables, noisy, tt, cond):
        colls = {"params": variables["params"]}
        if "lora" in variables:
            colls["lora"] = variables["lora"]
        return dit.apply(colls, noisy, cond["txt"], tt, cond["pe"])

    tx = get_optimizer("adamw8bit", 1e-4)
    step = make_jitted_train_step(predict, FlowMatchSchedule(), TrainStepConfig(), tx)
    state = TrainState.create({"params": params}, {"lora": lora}, tx)
    batch = {"latents": tokens, "cond": {"txt": txt, "pe": pe}}

    t0 = time.time()
    state, m = step(state, batch, jax.random.key(2))
    loss = float(m["loss"])
    print(f"{name}: compile+first {time.time()-t0:.0f}s loss={loss:.4f}", flush=True)

    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, batch, jax.random.key(2))
        loss = float(m["loss"])
    dt = (time.time() - t0) / iters
    print(f"{name} video train step: {dt*1000:.0f} ms/step -> {1/dt:.2f} steps/s "
          f"({frames/dt:.1f} frames/s trained)", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "wan21_33f"
    if which not in WORKLOADS:
        raise SystemExit(f"usage: bench_video.py {'|'.join(WORKLOADS)}")
    bench(which)
