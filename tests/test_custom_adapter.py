"""CustomAdapter umbrella (reference toolkit/custom_adapter.py types)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from ai_toolkit_tpu.adapters.custom_adapter import (
    CustomAdapterRuntime,
    init_custom_adapter,
    load_custom_adapter,
    save_custom_adapter,
)


@pytest.mark.parametrize("atype,feed", [
    ("redux", "vision_tokens"),
    ("clip_fusion", "vision_tokens"),
    ("te_augmenter", "vision_tokens"),
    ("vision_direct", "vision_tokens"),
    ("single_value", "extra_values"),
    ("photo_maker", "vision_pooled"),
])
def test_adapter_types_transform_cond(atype, feed):
    ctx_dim, vis_dim = 32, 24
    params, runtime = init_custom_adapter(
        {"type": atype, "num_tokens": 3}, ctx_dim, "txt", vis_dim, jax.random.key(0)
    )
    cond = {"txt": jnp.ones((2, 5, ctx_dim))}
    if feed == "vision_tokens":
        cond["vision_tokens"] = jax.random.normal(jax.random.key(1), (2, 7, vis_dim))
    elif feed == "extra_values":
        cond["extra_values"] = jnp.asarray([[0.5, -0.5, 1.0]] * 2)[:, :3]
    else:
        cond["vision_pooled"] = jax.random.normal(jax.random.key(1), (2, vis_dim))
    out = runtime.apply_cond({"adapter": params}, cond)
    if atype == "vision_direct":
        assert out["ip_tokens"].shape == (2, 7, ctx_dim)
        assert out["txt"].shape == cond["txt"].shape  # context untouched
    elif atype == "te_augmenter":
        assert out["txt"].shape == cond["txt"].shape  # in-place augmentation
        assert float(jnp.abs(out["txt"] - cond["txt"]).max()) == 0.0  # zero-init gate
    else:
        assert out["txt"].shape[1] > cond["txt"].shape[1]  # tokens appended
    # no adapter params -> identity
    same = runtime.apply_cond({}, cond)
    assert same["txt"].shape == cond["txt"].shape


def test_photo_maker_full_replaces_class_tokens_only():
    """Full PhotoMaker (reference photomaker.py FuseModule): trigger-token
    embeds are replaced, every other position is untouched."""
    ctx_dim, vis_dim = 32, 24
    params, runtime = init_custom_adapter(
        {"type": "photo_maker_full"}, ctx_dim, "txt", vis_dim, jax.random.key(0)
    )
    txt = jax.random.normal(jax.random.key(1), (2, 6, ctx_dim))
    mask = jnp.asarray([[0, 1, 0, 0, 1, 0], [0, 0, 1, 0, 0, 0]], jnp.int32)
    cond = {
        "txt": txt,
        "vision_pooled": jax.random.normal(jax.random.key(2), (2, vis_dim)),
        "class_tokens_mask": mask,
    }
    out = runtime.apply_cond({"adapter": params}, cond)
    new = np.asarray(out["txt"])
    old = np.asarray(txt)
    assert out["txt"].shape == txt.shape  # in-place replacement, no appends
    assert "class_tokens_mask" not in out
    m = np.asarray(mask, bool)
    np.testing.assert_array_equal(new[~m], old[~m])
    assert np.abs(new[m] - old[m]).max() > 1e-6
    # id image matters: different image -> different fused embeds
    cond2 = {**cond, "vision_pooled": jax.random.normal(jax.random.key(3), (2, vis_dim))}
    out2 = runtime.apply_cond({"adapter": params}, cond2)
    assert np.abs(np.asarray(out2["txt"])[m] - new[m]).max() > 1e-6


@pytest.mark.slow
def test_photo_maker_full_training_e2e(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("photo of [trigger] person")
    cfg = {
        "job": "extension",
        "config": {"name": "pmf", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "trigger_word": "sks",
            "adapter": {"type": "photo_maker_full"},
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear",
                      "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "sd3", "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    proc = job.processes[0]
    ad = proc._final_state.trainable["adapter"]
    assert "mlp1" in ad and "proj1" in ad and "proj2" in ad
    moved = jax.tree.leaves(jax.tree.map(lambda x: float(jnp.abs(x).max()), ad))
    assert any(v > 0 for v in moved)


def test_adapter_append_extends_txt_mask():
    params, runtime = init_custom_adapter(
        {"type": "redux"}, 16, "txt", 8, jax.random.key(0)
    )
    cond = {
        "txt": jnp.ones((1, 4, 16)),
        "txt_mask": jnp.asarray([[True, True, False, False]]),
        "vision_tokens": jnp.ones((1, 3, 8)),
    }
    out = runtime.apply_cond({"adapter": params}, cond)
    assert out["txt"].shape[1] == 7
    assert out["txt_mask"].shape[1] == 7
    assert bool(out["txt_mask"][0, -1])  # appended tokens visible


def test_adapter_save_load_roundtrip(tmp_path):
    params, runtime = init_custom_adapter(
        {"type": "redux"}, 16, "txt", 8, jax.random.key(0)
    )
    p = str(tmp_path / "redux.safetensors")
    save_custom_adapter(jax.tree.map(np.asarray, params), "redux", p, metadata={"step": 5})
    loaded, atype = load_custom_adapter(p)
    assert atype == "redux"
    np.testing.assert_allclose(
        np.asarray(params["redux_up"]["kernel"]), loaded["redux_up"]["kernel"], atol=1e-7
    )


@pytest.mark.slow
def test_redux_adapter_training_e2e(tmp_path):
    """Full trainer run with adapter: {type: redux} on tiny flux."""
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"photo {i}")

    cfg = {
        "job": "extension",
        "config": {
            "name": "redux_e2e",
            "process": [{
                "type": "sd_trainer",
                "training_folder": str(tmp_path / "output"),
                "adapter": {"type": "redux"},
                "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                "save": {"save_every": 100},
                "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                              "resolution": 32}],
                "train": {"batch_size": 2, "steps": 3, "noise_scheduler": "flowmatch",
                          "timestep_type": "sigmoid", "optimizer": "adamw", "lr": 1e-3,
                          "dtype": "float32", "ema_config": {"use_ema": False}},
                "model": {"name_or_path": "", "arch": "flux",
                          "model_kwargs": {"size": "tiny"}},
                "sample": {"sample_every": 0, "prompts": []},
                "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
            }],
        },
    }
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    out_dir = tmp_path / "output" / "redux_e2e"
    files = os.listdir(out_dir)
    assert any(f.endswith(".safetensors") for f in files)
    loaded, atype = load_custom_adapter(
        os.path.join(out_dir, "redux_e2e.safetensors")
    )
    assert atype == "redux" and "redux_up" in loaded


@pytest.mark.slow
def test_assistant_lora_fuse_unfuse(tmp_path):
    """assistant_lora_path fuses into the base for training, unfuses for
    sampling (reference assistant_lora.py / base_model.py:396-411)."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, merge_lora, unmerge_lora
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.io.lora_file import save_lora_file
    from ai_toolkit_tpu.models.flux_dit import flux_lora_key_map
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRASpec(rank=4, alpha=4.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(5))
    # make the delta nonzero (fresh loras have zero up matrices)
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    p = str(tmp_path / "assistant.safetensors")
    save_lora_file(lora, p, fmt="peft", key_map=flux_lora_key_map(lora))

    # trainer-level fuse via config
    import numpy as np
    import yaml
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {
        "job": "extension",
        "config": {"name": "asst", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt", "resolution": 32}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "timestep_type": "sigmoid", "optimizer": "adamw", "lr": 1e-3,
                      "dtype": "float32", "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "flux",
                      "model_kwargs": {"size": "tiny"},
                      "assistant_lora_path": p},
            "sample": {"sample_every": 0, "sampler": "flowmatch", "width": 32,
                       "height": 32, "sample_steps": 2, "prompts": ["y --seed 1"]},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    proc = job.processes[0]
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    assert proc._assistant_lora is not None
    # fuse/unfuse round-trip is exact
    main, tree = proc._assistant_lora
    merged = merge_lora(variables["dit"], tree)
    back = unmerge_lora(merged, tree)
    a = jax.tree.leaves(variables["dit"])[0]
    b = jax.tree.leaves(back)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # final sample was produced through the unfused path
    samples = os.listdir(tmp_path / "out" / "asst" / "samples")
    assert samples


def test_t2i_adapter_trainable_and_assist():
    """t2i adapter: residual net trains; frozen assist changes the UNet output."""
    from ai_toolkit_tpu.adapters.custom_adapter import init_custom_adapter
    from ai_toolkit_tpu.adapters.t2i_adapter import init_t2i_adapter
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["a house"])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    ctrl = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3)) * 2 - 1

    # frozen assist path: residuals injected -> output changes
    ds = model.vae_config.downscale
    net, params = init_t2i_adapter(model.unet_config, jax.random.key(3), image_size=64,
                                   downscale=ds)
    res = net.apply({"params": params}, ctrl)
    assert len(res) == len(model.unet_config.block_out_channels)
    out_plain = model.predict(variables, noisy, jnp.array([100.0]), cond)
    out_assist = model.predict(
        variables, noisy, jnp.array([100.0]), {**cond, "adapter_residuals": res}
    )
    assert float(jnp.abs(out_plain - out_assist).max()) > 1e-6

    # trainable t2i through the CustomAdapterRuntime
    params2, runtime = init_custom_adapter(
        {"type": "t2i", "_unet_channels": list(model.unet_config.block_out_channels),
         "_image_size": 64, "downscale": model.vae_config.downscale},
        ctx_dim=0, ctx_key="context", vision_dim=0, rng=jax.random.key(4),
    )
    cond2 = runtime.apply_cond({"adapter": params2}, {**cond, "control_pixels": ctrl})
    assert "adapter_residuals" in cond2
    out2 = model.predict(variables, noisy, jnp.array([100.0]), cond2)
    assert np.isfinite(np.asarray(out2)).all()


@pytest.mark.slow
def test_clip_vision_disk_cache(tmp_path):
    """cache_clip_vision_to_disk writes per-image embeds and serves cache
    hits (reference dataloader_mixins is_caching_clip_vision_to_disk)."""
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("photo")
    cfg = {
        "job": "extension",
        "config": {"name": "cvc", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "adapter": {"type": "redux", "cache_clip_vision_to_disk": True},
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64}],
            "train": {"batch_size": 1, "steps": 3, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear", "optimizer": "adamw", "lr": 1e-3,
                      "dtype": "float32", "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "sd3", "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    proc = job.processes[0]
    cache_dir = os.path.join(proc.save_root, "clip_vision_cache")
    files = os.listdir(cache_dir)
    assert len(files) == 2  # one per distinct image, reused across steps
    from safetensors.numpy import load_file

    d = load_file(os.path.join(cache_dir, files[0]))
    assert "tokens" in d and "pooled" in d


def test_decorator_token_bank():
    """Decorator (reference toolkit/models/decorator.py): N learned tokens
    appended to the text sequence; grads flow into the bank."""
    ctx_dim = 32
    params, runtime = init_custom_adapter(
        {"type": "decorator", "num_tokens": 3}, ctx_dim, "txt", 0, jax.random.key(0)
    )
    assert params["bank"].shape == (3, ctx_dim)
    cond = {"txt": jnp.ones((2, 5, ctx_dim))}
    out = runtime.apply_cond({"adapter": params}, cond)
    assert out["txt"].shape == (2, 8, ctx_dim)
    np.testing.assert_allclose(np.asarray(out["txt"][0, 5:]), np.asarray(params["bank"]),
                               atol=1e-6)

    def loss(p):
        return jnp.mean(jnp.square(runtime.apply_cond({"adapter": p}, cond)["txt"]))

    g = jax.grad(loss)(params)
    assert float(np.abs(np.asarray(g["bank"])).sum()) > 0


def test_decorator_training_e2e(tmp_path):
    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {"job": "extension", "config": {"name": "deco", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "adapter": {"type": "decorator", "num_tokens": 2},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                  "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                  "timestep_type": "linear", "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "sd3",
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
    assert (tmp_path / "out" / "deco" / "deco.safetensors").exists()


def test_text_encoder_swap_training_e2e(tmp_path):
    """adapter type 'text_encoder' (reference custom_adapter.py:104-286):
    trains a full TE copy in-graph while the unet stays frozen."""
    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("a photo")
    cfg = {"job": "extension", "config": {"name": "tesw", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "adapter": {"type": "text_encoder"},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "ddpm",
                  "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
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


@pytest.mark.slow
def test_subpixel_adapter_training_e2e(tmp_path):
    """Subpixel adapter (reference toolkit/models/subpixel_adapter.py): flux
    trains in pixel-unshuffle space — fresh img_in/final_proj + control lora
    that skips them; sampling runs with the trained projections."""
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("photo of a thing")
    cfg = {
        "job": "extension",
        "config": {"name": "subpx", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "adapter": {"type": "subpixel", "subpixel_downscale_factor": 8},
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear",
                      "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "flux", "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 2, "sample_steps": 2, "width": 64,
                       "height": 64, "prompts": ["a thing --seed 1"]},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    proc = job.processes[0]
    tr = proc._final_state.trainable
    # fresh projections sized for 192-ch latents packed 2x2 -> 768
    assert tr["adapter"]["img_in"]["kernel"].shape[0] == 768
    assert tr["adapter"]["final_proj"]["kernel"].shape[1] == 768
    # control lora skipped the swapped projections
    assert "img_in" not in tr["lora"] and "final_proj" not in tr["lora"]
    # projections actually trained (moved off their init)
    g = jax.tree.leaves(jax.tree.map(lambda x: float(jnp.abs(x).max()),
                                     tr["adapter"]))
    assert all(np.isfinite(v) for v in g)
    # sampling produced an image through the pixel-shuffle decode path
    samples = os.listdir(tmp_path / "out" / "subpx" / "samples")
    assert any(f.endswith(".png") for f in samples)


def test_subpixel_roundtrip_and_latent_shape():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.flux_model import _depth_to_space, _space_to_depth
    from ai_toolkit_tpu.models.registry import get_model_class

    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    z = _space_to_depth(x, 8)
    assert z.shape == (2, 2, 2, 192)
    np.testing.assert_allclose(np.asarray(_depth_to_space(z, 8)), np.asarray(x))
    # torch PixelUnshuffle channel order: c_out = c*f*f + fi*f + fj
    import torch

    tz = torch.nn.PixelUnshuffle(8)(torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(z), tz.permute(0, 2, 3, 1).numpy(), rtol=1e-6
    )

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    io = model.enable_subpixel(jax.random.key(1), 8)
    assert model.latent_shape(128, 128) == (16, 16, 192)
    assert io["img_in"]["kernel"].shape == (768, model.dit_config.hidden_size)
    lat = model.encode_images({}, x)
    # reference normalization: 1.8 * (unshuffle(x) - (-0.123))
    np.testing.assert_allclose(
        np.asarray(lat), np.asarray((z + 0.123) * 1.8), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(model.decode_latents({}, lat)), np.asarray(x), rtol=1e-4, atol=1e-5
    )


def test_vision_direct_flux_pixtral_e2e(tmp_path):
    """vision_direct on flux with the exact pixtral tower (reference
    vd_adapter.py flux path + pixtral_vision.py): per-block decoupled KV
    trains; pixtral+flux_only_double inserts the VisionLanguageAdapter."""
    import yaml
    from PIL import Image

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")

    for extra in ({}, {"flux_only_double": True}):
        out_name = "vdpx" + ("d" if extra else "")
        cfg = {"job": "extension", "config": {"name": out_name, "process": [{
            "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
            "adapter": {"type": "vision_direct",
                        "image_encoder_arch": "pixtral", **extra},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 32, "cache_latents": False,
                          "cache_latents_to_disk": False}],
            "train": {"batch_size": 1, "steps": 2,
                      "noise_scheduler": "flowmatch", "optimizer": "adamw",
                      "lr": 1e-4, "dtype": "float32",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "flux",
                      "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
        }]}}
        p = tmp_path / f"job_{out_name}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        from ai_toolkit_tpu.config import get_config
        from ai_toolkit_tpu.jobs import get_job

        job = get_job(get_config(p))
        results = job.run()
        assert np.isfinite(results[0]["final_loss"])
        assert (tmp_path / "out" / out_name / f"{out_name}.safetensors").exists()
