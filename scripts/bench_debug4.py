import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT, flux_lora_targets
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

cfg = FluxConfig(depth_double=4, depth_single=8, remat=True, scan_blocks=True)
model = FluxDiT(cfg)
n_img, n_txt = 4096, 512
txt = jnp.zeros((1, n_txt, cfg.context_dim), jnp.bfloat16)
t0_ = jnp.zeros((1,)); y = jnp.zeros((1, cfg.vec_dim))
ids = image_position_ids(64, 64, text_len=n_txt)
pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
img = jnp.zeros((1, n_img, cfg.in_channels), jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.key(0), img, txt, t0_, y, pe, t0_)
params = variables["params"]
print("init ok", flush=True)
lora = build_lora(params, LoRASpec(rank=16, alpha=16, target_patterns=flux_lora_targets()), jax.random.key(1))

def predict_fn(v, noisy, tt, cond):
    colls = {"params": v["params"]}
    if "lora" in v: colls["lora"] = v["lora"]
    return model.apply(colls, noisy, cond["txt"], tt, cond["y"], cond["pe"], cond["guidance"])

base = make_train_step(predict_fn, FlowMatchSchedule(), TrainStepConfig(timestep_type="flux_shift", ema_decay=0.99))
tx = get_optimizer("adamw", 1e-4)  # plain adamw, no donation

@partial(jax.jit, static_argnames=("image_seq_len",))
def inner(mv, trainable, opt_state, ema, stepno, batch, rng, image_seq_len=None):
    st = TrainState(step=stepno, model_variables=mv, trainable=trainable, opt_state=opt_state, ema=ema, tx=tx)
    new, m = base(st, batch, rng, image_seq_len)
    return (new.trainable, new.opt_state, new.ema, new.step), m["loss"]

state = TrainState.create({"params": params}, {"lora": lora}, tx, use_ema=True)
batch = {"latents": img, "cond": {"txt": txt, "y": y, "pe": pe, "guidance": jnp.ones((1,))}}
small = (state.trainable, state.opt_state, state.ema, state.step)
t0=time.time()
small, loss = inner({"params": params}, *small, batch, jax.random.key(2), image_seq_len=n_img)
print("compile+first:", time.time()-t0, "loss", float(loss), flush=True)
for i in range(3):
    t0=time.time()
    small, loss = inner({"params": params}, *small, batch, jax.random.key(2), image_seq_len=n_img)
    l=float(loss)
    print(f"step: {time.time()-t0:.3f}s", flush=True)
