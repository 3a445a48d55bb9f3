"""Account for the end-to-end vs in-kernel TFLOP/s gap on the bench model.

Round-3 verdict: the flash kernel sustains ~175 TF/s in-scan while the full
train step lands at ~145 TF/s — this script names where the ~17% goes, in ONE
process on the bench-model shapes:

  1. full train step (grad + adamw8bit update + ema)     -> measured
  2. grad only (no optimizer/ema)                        -> optimizer cost
  3. fwd loss only                                       -> bwd/remat cost
  4. fwd without the lora collection                     -> lora-branch cost
  5. XLA cost_analysis flops+bytes for each              -> roofline floors
     (v5e: 197 TF/s bf16 MXU, 819 GB/s HBM)

The floor for each graph is max(flops/197e12, bytes/819e9); measured-vs-floor
says whether more fusion could help or the graph is already roofline-bound.
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
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT, flux_lora_targets
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_jitted_train_step

V5E_PEAK = 197e12
V5E_HBM = 819e9

cfg = FluxConfig(depth_double=4, depth_single=8, remat=True,
                 remat_policy="dots_flash", scan_blocks=True)
model = FluxDiT(cfg)
B, TXT = 1, 512
lh = lw = 128
n_img = (lh // 2) * (lw // 2)
img = jnp.zeros((B, n_img, cfg.in_channels), jnp.bfloat16)
txt = jnp.zeros((B, TXT, cfg.context_dim), jnp.bfloat16)
t = jnp.zeros((B,))
y = jnp.zeros((B, cfg.vec_dim))
ids = image_position_ids(lh // 2, lw // 2, text_len=TXT)
pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)

t0 = time.time()
params = jax.jit(model.init)(jax.random.key(0), img, txt, t, y, pe, t)["params"]
print(f"init {time.time()-t0:.0f}s", flush=True)
lora = build_lora(params, LoRASpec(rank=16, alpha=16,
                                   target_patterns=flux_lora_targets()),
                  jax.random.key(1))


def predict_fn(variables, noisy, tt, cond):
    colls = {"params": variables["params"]}
    if "lora" in variables:
        colls["lora"] = variables["lora"]
    return model.apply(colls, noisy, cond["txt"], tt, cond["y"], cond["pe"],
                       cond["guidance"])


schedule = FlowMatchSchedule()
step_cfg = TrainStepConfig(timestep_type="flux_shift", ema_decay=0.99)
tx = get_optimizer("adamw8bit", 1e-4)
step = make_jitted_train_step(predict_fn, schedule, step_cfg, tx)
state = TrainState.create({"params": params}, {"lora": lora}, tx, use_ema=True)
batch = {"latents": img,
         "cond": {"txt": txt, "y": y, "pe": pe, "guidance": jnp.ones((B,))}}
rng = jax.random.key(2)


def timed(name, call, compiled=None):
    call()  # compile+warm
    call()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        call()
        best = min(best, time.time() - t0)
    line = f"{name:34s} {best*1000:8.1f} ms"
    if compiled is not None:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        floor = max(fl / V5E_PEAK, by / V5E_HBM)
        line += (f"  {fl/best/1e12:6.1f} TF/s  {by/best/1e9:6.0f} GB/s"
                 f"  floor {floor*1000:7.1f} ms ({best/floor:4.2f}x)")
    print(line, flush=True)
    return best


# 1. full step
def full():
    s, m = step(state, batch, rng, image_seq_len=n_img)
    return float(m["loss"])


low_full = step._inner.lower(state.model_variables, state.trainable,
                             state.opt_state, state.ema, state.step, batch,
                             rng, image_seq_len=n_img).compile()
t_full = timed("full train step", full, low_full)

# 2. grad only (no optimizer update / ema) — reuse the loss fn via jax.grad
from ai_toolkit_tpu.train.step import make_train_step  # noqa: E402


@jax.jit
def grad_only(mv, tr, batch, rng):
    def loss_fn(tr):
        variables = {**mv, **tr}
        noise = jax.random.normal(rng, batch["latents"].shape, jnp.bfloat16)
        tt = jnp.full((B,), 0.5)
        noisy = (1 - 0.5) * batch["latents"] + 0.5 * noise
        pred = predict_fn(variables, noisy, tt, batch["cond"])
        return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
    l, g = jax.value_and_grad(loss_fn)(tr)
    return l, g


low_grad = grad_only.lower(state.model_variables, state.trainable, batch, rng).compile()
t_grad = timed("grad only (no opt/ema)",
               lambda: float(grad_only(state.model_variables, state.trainable,
                                       batch, rng)[0]), low_grad)


# 3. fwd only
@jax.jit
def fwd_only(mv, tr, batch, rng):
    variables = {**mv, **tr}
    noise = jax.random.normal(rng, batch["latents"].shape, jnp.bfloat16)
    noisy = 0.5 * batch["latents"] + 0.5 * noise
    pred = predict_fn(variables, noisy, jnp.full((B,), 0.5), batch["cond"])
    return jnp.mean(pred.astype(jnp.float32) ** 2)


low_fwd = fwd_only.lower(state.model_variables, state.trainable, batch, rng).compile()
t_fwd = timed("fwd loss only",
              lambda: float(fwd_only(state.model_variables, state.trainable,
                                     batch, rng)), low_fwd)


# 4. fwd without lora
@jax.jit
def fwd_nolora(mv, batch, rng):
    noise = jax.random.normal(rng, batch["latents"].shape, jnp.bfloat16)
    noisy = 0.5 * batch["latents"] + 0.5 * noise
    pred = predict_fn(mv, noisy, jnp.full((B,), 0.5), batch["cond"])
    return jnp.mean(pred.astype(jnp.float32) ** 2)


low_nl = fwd_nolora.lower(state.model_variables, batch, rng).compile()
t_nl = timed("fwd loss, no lora",
             lambda: float(fwd_nolora(state.model_variables, batch, rng)), low_nl)

print(f"\noptimizer+ema cost : {1000*(t_full-t_grad):7.1f} ms "
      f"({(t_full-t_grad)/t_full*100:4.1f}% of step)")
print(f"bwd(+remat) cost   : {1000*(t_grad-t_fwd):7.1f} ms "
      f"({(t_grad-t_fwd)/t_full*100:4.1f}% of step)")
print(f"lora fwd cost      : {1000*(t_fwd-t_nl):7.1f} ms "
      f"({(t_fwd-t_nl)/t_full*100:4.1f}% of step, fwd only)")
