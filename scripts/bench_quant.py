import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.adapters.quantize import quantize_params
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT, flux_lora_targets
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope

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
rest, quant = quantize_params(params)
qbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(quant))
pbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(rest))
print(f"quant {qbytes/1e9:.2f} GB + rest {pbytes/1e9:.2f} GB", flush=True)
lora = build_lora(params, LoRASpec(rank=16, alpha=16, target_patterns=flux_lora_targets()), jax.random.key(1))

def loss_fn(lora, rest, quant, img):
    out = model.apply({"params": rest, "quant": quant, "lora": lora}, img, txt, t0_, y, pe, t0_)
    return jnp.mean(jnp.square(out.astype(jnp.float32)))

grad = jax.jit(jax.grad(loss_fn))
g = grad(lora, rest, quant, img)
gn = float(jax.tree.leaves(g)[0].ravel()[0])
for i in range(3):
    t0=time.time()
    g = grad(lora, rest, quant, img)
    gn = float(jax.tree.leaves(g)[0].ravel()[0])
    print(f"quantized fwd+bwd: {time.time()-t0:.3f}s", flush=True)
