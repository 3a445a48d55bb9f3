import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT, flux_lora_targets
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope

for policy in ("dots", "full"):
    cfg = FluxConfig(depth_double=4, depth_single=8, remat=True, scan_blocks=True,
                     remat_policy=policy)
    model = FluxDiT(cfg)
    n_img, n_txt = 4096, 512
    txt = jnp.zeros((1, n_txt, cfg.context_dim), jnp.bfloat16)
    t0_ = jnp.zeros((1,)); y = jnp.zeros((1, cfg.vec_dim))
    ids = image_position_ids(64, 64, text_len=n_txt)
    pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
    img = jnp.zeros((1, n_img, cfg.in_channels), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), img, txt, t0_, y, pe, t0_)
    params = variables["params"]
    lora = build_lora(params, LoRASpec(rank=16, alpha=16, target_patterns=flux_lora_targets()), jax.random.key(1))

    def loss_fn(lora, params, img):
        out = model.apply({"params": params, "lora": lora}, img, txt, t0_, y, pe, t0_)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    grad = jax.jit(jax.grad(loss_fn))
    try:
        g = grad(lora, params, img)
        gn = float(jax.tree.leaves(g)[0].ravel()[0])
        t0 = time.time()
        for i in range(3):
            g = grad(lora, params, img)
            gn = float(jax.tree.leaves(g)[0].ravel()[0])
        print(f"{policy}: {(time.time()-t0)/3:.3f}s fwd+bwd", flush=True)
    except Exception as e:
        print(f"{policy}: FAILED {type(e).__name__}", flush=True)
