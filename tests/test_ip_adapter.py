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


def test_ip_adapter_plus_resampler_and_e2e(tmp_path):
    """ip-adapter-plus: patch tokens -> perceiver resampler -> ip tokens; the
    full trainer path runs with adapter type ip_adapter_plus."""
    from safetensors import safe_open

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    cross = model.unet_config.cross_attention_dim
    ip, proj_params, proj = init_ip_adapter(
        variables["unet"], cross, clip_embed_dim=64, n_tokens=8,
        rng=jax.random.key(1), plus=True, resampler_dim=64, resampler_heads=2,
        resampler_depth=2,
    )
    tokens = jax.random.normal(jax.random.key(3), (2, 17, 64))  # patch tokens
    out = proj.apply({"params": proj_params}, tokens)
    assert out.shape == (2, 8, cross)
    assert np.isfinite(np.asarray(out)).all()

    # grads reach the learned latents and every perceiver layer
    def loss(pp):
        return jnp.mean(jnp.square(proj.apply({"params": pp}, tokens)))

    g = jax.grad(loss)(proj_params)
    assert float(np.abs(np.asarray(g["latents"])).sum()) > 0
    assert float(np.abs(np.asarray(g["layer_1_to_kv"]["kernel"])).sum()) > 0

    p = str(tmp_path / "ip_plus.safetensors")
    save_ip_adapter(ip, proj_params, p, metadata={"step": 1})
    with safe_open(p, framework="numpy") as f:
        keys = list(f.keys())
    assert "image_proj.latents" in keys
    assert "image_proj.proj_in.weight" in keys
    assert "ip_adapter.0.to_k_ip.weight" in keys


def test_ip_adapter_plus_trainer_e2e(tmp_path):
    import yaml
    from PIL import Image

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {"job": "extension", "config": {"name": "ipp", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "adapter": {"type": "ip_adapter_plus", "num_tokens": 4,
                    "resampler_depth": 2},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64, "cache_latents": False,
                      "cache_latents_to_disk": False}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "ddpm",
                  "optimizer": "adamw", "lr": 1e-4, "dtype": "float32",
                  "timestep_type": "linear", "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "sd1",
                  "model_kwargs": {"size": "tiny"}},
        "sample": {"sample_every": 0, "prompts": []},
    }]}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    assert (tmp_path / "out" / "ipp" / "ipp.safetensors").exists()
