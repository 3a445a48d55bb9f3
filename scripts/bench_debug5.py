# probe: scan + remat(policy=dots_saveable) step time/memory
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import flax.linen as nn
from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
import ai_toolkit_tpu.models.flux_dit as fd
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope

# monkeypatch the remat policy used in scan
orig_remat = nn.remat
def remat_policy(mod, prevent_cse=False, **kw):
    return orig_remat(mod, prevent_cse=prevent_cse,
                      policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable, **kw)
fd.nn.remat = remat_policy

cfg = fd.FluxConfig(depth_double=4, depth_single=8, remat=True, scan_blocks=True)
model = fd.FluxDiT(cfg)
n_img, n_txt = 4096, 512
txt = jnp.zeros((1, n_txt, cfg.context_dim), jnp.bfloat16)
t0_ = jnp.zeros((1,)); y = jnp.zeros((1, cfg.vec_dim))
ids = image_position_ids(64, 64, text_len=n_txt)
pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
img = jnp.zeros((1, n_img, cfg.in_channels), jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.key(0), img, txt, t0_, y, pe, t0_)
params = variables["params"]
lora = build_lora(params, LoRASpec(rank=16, alpha=16, target_patterns=fd.flux_lora_targets()), jax.random.key(1))

def loss_fn(lora, params, img):
    out = model.apply({"params": params, "lora": lora}, img, txt, t0_, y, pe, t0_)
    return jnp.mean(jnp.square(out.astype(jnp.float32)))

grad = jax.jit(jax.grad(loss_fn))
t0=time.time()
g = grad(lora, params, img)
gn = float(jax.tree.leaves(g)[0].ravel()[0])
print("policy-remat compile+first:", time.time()-t0, flush=True)
for i in range(3):
    t0=time.time()
    g = grad(lora, params, img)
    gn = float(jax.tree.leaves(g)[0].ravel()[0])
    print(f"policy-remat fwd+bwd: {time.time()-t0:.3f}s", flush=True)
