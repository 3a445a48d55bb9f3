import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.adapters.ip_adapter import (
    ImageProjModel,
    build_ip_collection,
    init_ip_adapter,
    save_ip_adapter,
)
from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, CLIPVisionModel


def test_clip_vision_tower():
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModel(cfg)
    px = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    v = model.init(jax.random.key(1), px)
    out = model.apply(v, px)
    n_patches = (32 // 8) ** 2
    assert out["last_hidden_state"].shape == (2, n_patches + 1, 64)
    assert out["pooled_output"].shape == (2, 64)


def test_ip_adapter_forward_and_grads():
    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    cross = model.unet_config.cross_attention_dim
    ip, proj_params, proj = init_ip_adapter(variables["unet"], cross, clip_embed_dim=32,
                                            n_tokens=4, rng=jax.random.key(1))
    assert ip, "no attn2 modules found"

    cond = model.encode_prompt(variables, ["a cat"])
    h, w, c = model.latent_shape(64, 64)
    noisy = jax.random.normal(jax.random.key(2), (1, h, w, c))
    t = jnp.array([100.0])

    base = model.predict(variables, noisy, t, cond)
    embeds = jax.random.normal(jax.random.key(3), (1, 32))
    ip_tokens = proj.apply({"params": proj_params}, embeds)
    with_ip = model.predict({**variables, "ip": ip}, noisy, t, {**cond, "ip_tokens": ip_tokens})
    assert with_ip.shape == base.shape
    assert not np.allclose(np.asarray(with_ip), np.asarray(base))
    # without ip_tokens, ip collection is inert
    no_tokens = model.predict({**variables, "ip": ip}, noisy, t, cond)
    np.testing.assert_allclose(np.asarray(no_tokens), np.asarray(base), atol=1e-6)

    # grads flow to both ip K/V and projection
    def loss(trainable):
        toks = proj.apply({"params": trainable["proj"]}, embeds)
        out = model.predict({**variables, "ip": trainable["ip"]}, noisy, t,
                            {**cond, "ip_tokens": toks})
        return jnp.mean(jnp.square(out))

    g = jax.grad(loss)({"ip": ip, "proj": proj_params})
    leaves = [np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(g)]
    assert sum(leaves) > 0


def test_ip_adapter_save(tmp_path):
    from safetensors import safe_open

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    ip, proj_params, _ = init_ip_adapter(variables["unet"], model.unet_config.cross_attention_dim,
                                         32, 4, jax.random.key(1))
    p = str(tmp_path / "ip.safetensors")
    save_ip_adapter(ip, proj_params, p, metadata={"step": 1})
    with safe_open(p, framework="numpy") as f:
        keys = list(f.keys())
    assert "image_proj.proj.weight" in keys
    assert "ip_adapter.0.to_k_ip.weight" in keys
