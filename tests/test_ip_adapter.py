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


def test_flux_ip_collection_forward_and_grads():
    """Flux decoupled-KV path (reference vd_adapter.py
    CustomFluxVDAttnProcessor2_0 / ip_adapter.py CustomIPFluxAttnProcessor2_0):
    ip_tokens + 'ip' collection change the output; absent tokens are a no-op;
    grads flow to to_k/to_v."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.adapters.ip_adapter import (
        build_flux_ip_collection,
        flux_ip_flat,
        load_flux_ip_flat,
    )
    from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT
    from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope

    for scan in (False, True):
        cfg = FluxConfig.tiny()
        import dataclasses
        cfg = dataclasses.replace(cfg, scan_blocks=scan)
        model = FluxDiT(cfg)
        n_txt, gh = 8, 4
        img = jnp.ones((1, gh * gh, cfg.in_channels)) * 0.1
        txt = jnp.ones((1, n_txt, cfg.context_dim)) * 0.1
        t = jnp.array([0.5])
        y = jnp.zeros((1, cfg.vec_dim))
        ids = image_position_ids(gh, gh, text_len=n_txt)
        pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
        params = model.init(jax.random.key(0), img, txt, t, y, pe, t)["params"]

        mid = 24
        ip = build_flux_ip_collection(params, mid, jax.random.key(1),
                                      init="from_qkv")
        tokens = jax.random.normal(jax.random.key(2), (1, 5, mid))

        base = model.apply({"params": params}, img, txt, t, y, pe, t)
        with_ip = model.apply({"params": params, "ip": ip}, img, txt, t, y,
                              pe, t, ip_tokens=tokens)
        no_tok = model.apply({"params": params, "ip": ip}, img, txt, t, y, pe, t)
        assert not np.allclose(np.asarray(base), np.asarray(with_ip)), scan
        np.testing.assert_allclose(np.asarray(base), np.asarray(no_tok),
                                   atol=1e-6)

        def loss(ip):
            out = model.apply({"params": params, "ip": ip}, img, txt, t, y,
                              pe, t, ip_tokens=tokens)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(ip)
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0, scan

        # only_double: single blocks carry no adapter
        ip_d = build_flux_ip_collection(params, mid, jax.random.key(1),
                                        init="from_qkv", only_double=True)
        keys = set(ip_d.keys())
        assert not any(k.startswith("single") for k in keys), keys

        # reference-layout flat round-trip
        flat = flux_ip_flat(ip, fmt="vd")
        assert any(k.startswith("adapter_modules.0.to_k_adapter") for k in flat)
        back = load_flux_ip_flat(flat, ip, fmt="vd")
        for a, b in zip(jax.tree.leaves(ip), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=1e-6)


def test_flux_ip_adapter_trainer_e2e(tmp_path):
    """ip_adapter_plus on tiny flux: Resampler -> DiT hidden tokens ->
    decoupled per-block KV (reference ip_adapter.py:508-556 is_flux)."""
    import yaml
    from PIL import Image

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")
    ref_img = folder / "im_0.png"
    cfg = {"job": "extension", "config": {"name": "ipf", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "adapter": {"type": "ip_adapter_plus", "num_tokens": 4,
                    "resampler_depth": 1, "resampler_dim": 32},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 32, "cache_latents": False,
                      "cache_latents_to_disk": False}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                  "optimizer": "adamw", "lr": 1e-4, "dtype": "float32",
                  "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "flux",
                  "model_kwargs": {"size": "tiny"}},
        # sample WITH the adapter reference image (--ctrl_img is consumed as
        # the ip image: trainer pre-encodes it through the vision tower)
        "sample": {"sample_every": 2, "width": 32, "height": 32,
                   "sample_steps": 2, "sampler": "flowmatch",
                   "prompts": [f"x --ctrl_img {ref_img}"]},
    }]}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    assert (tmp_path / "out" / "ipf" / "ipf.safetensors").exists()
    import os

    samples = os.listdir(tmp_path / "out" / "ipf" / "samples")
    assert any(f.endswith(".png") for f in samples), samples
