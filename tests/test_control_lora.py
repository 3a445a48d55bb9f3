"""Control-LoRA adapter (reference toolkit/models/control_lora_adapter.py).

Covers: the 'ctrl' collection math (split-matmul == reference concat-weight),
the inpainting control assembly layout, and the e2e flux train/sample/save/
resume path with the reference save-key layout."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from ai_toolkit_tpu.adapters.control_lora import (
    X_EMBEDDER_KEY,
    assemble_inpaint_control,
    control_lora_extra_flat,
    init_control_lora,
    load_control_lora_expansion,
    upgrade_expansion,
)
from ai_toolkit_tpu.ops.layers import Linear


def test_ctrl_collection_matches_concat_weight():
    """y = x_base @ K + x_extra @ W must equal linear(x, cat([K, W], dim=1))
    — the reference ImgEmbedder forward (control_lora_adapter.py:86-113)."""
    rng = jax.random.key(0)
    lin = Linear(6, dtype=jnp.float32, param_dtype=jnp.float32)
    x_base = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 8))
    params = lin.init(jax.random.fold_in(rng, 2), x_base)["params"]
    w = jax.random.normal(jax.random.fold_in(rng, 3), (4, 6))
    x_extra = jax.random.normal(jax.random.fold_in(rng, 4), (2, 5, 4))
    x = jnp.concatenate([x_base, x_extra], axis=-1)

    got = lin.apply({"params": params, "ctrl": {"w": w}}, x)
    # torch reference: cat([orig_w, new_w], dim=1) on [out, in] weights ==
    # row-concat in our [in, out] convention
    big_kernel = jnp.concatenate([params["kernel"], w], axis=0)
    want = x @ big_kernel + params["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # without the collection the layer is untouched
    base = lin.apply({"params": params}, x_base)
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(x_base @ params["kernel"] + params["bias"]),
        atol=1e-6,
    )


def test_ctrl_collection_lora_applies_to_base_only():
    """A LoRA on the same layer must see only the base input features (the
    reference never LoRAs x_embedder, but the split must stay consistent)."""
    rng = jax.random.key(1)
    lin = Linear(6, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32)
    x_base = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 8))
    params = lin.init(jax.random.fold_in(rng, 2), x_base)["params"]
    a = jax.random.normal(jax.random.fold_in(rng, 3), (8, 2))
    b = jax.random.normal(jax.random.fold_in(rng, 4), (2, 6))
    w = jnp.zeros((4, 6))
    x = jnp.concatenate([x_base, jnp.ones((2, 3, 4))], axis=-1)
    got = lin.apply(
        {"params": params, "ctrl": {"w": w},
         "lora": {"a": a, "b": b, "scale": jnp.asarray(1.0)}}, x
    )
    want = x_base @ params["kernel"] + (x_base @ a) @ b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_init_and_channel_math():
    rng = jax.random.key(0)
    ctrl = init_control_lora(32, 64, rng, num_control_images=2)
    assert ctrl["img_in"]["w"].shape == (128, 32)
    ctrl = init_control_lora(32, 64, rng, has_inpainting_input=True)
    assert ctrl["img_in"]["w"].shape == (68, 32)
    with pytest.raises(ValueError):
        init_control_lora(32, 64, rng, num_control_images=2,
                          has_inpainting_input=True)
    # init scale matches the reference (randn * 0.01)
    assert float(jnp.abs(ctrl["img_in"]["w"]).max()) < 0.1


def test_assemble_inpaint_control_layouts():
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    keep = np.ones((2, 64, 64, 1), np.float32)
    keep[:, :32] = 0.0  # top half inpainted
    out = assemble_inpaint_control(lat, keep, rng)
    assert out.shape == (2, 8, 8, 5)
    # masked latents zeroed in the inpaint area; mask = 1 there
    np.testing.assert_allclose(out[:, :4, :, :4], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, :4, :, 4], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 4:, :, :4], lat[:, 4:], atol=1e-6)
    np.testing.assert_allclose(out[:, 4:, :, 4], 0.0, atol=1e-6)
    # dropout: zero latents + all-ones mask (reference custom_adapter.py:683-687)
    out = assemble_inpaint_control(lat, keep, rng, control_image_dropout=1.0)
    np.testing.assert_allclose(out[..., :4], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 4], 1.0, atol=1e-6)


def test_expansion_save_load_upgrade(tmp_path):
    from safetensors.numpy import save_file

    ctrl = {"img_in": {"w": np.arange(12, dtype=np.float32).reshape(4, 3)}}
    flat = control_lora_extra_flat(ctrl)
    assert flat[X_EMBEDDER_KEY].shape == (3, 4)  # torch [out, in]
    p = str(tmp_path / "cl.safetensors")
    save_file(flat, p)
    got = load_control_lora_expansion(p)
    np.testing.assert_allclose(got["img_in"]["w"], ctrl["img_in"]["w"])
    # upgrade: tile up (reference control_lora_adapter.py:247-256), slice down
    up = upgrade_expansion(ctrl["img_in"]["w"], 6)
    assert up.shape == (6, 3)
    np.testing.assert_allclose(up[4:], ctrl["img_in"]["w"][:2])
    assert upgrade_expansion(ctrl["img_in"]["w"], 2).shape == (2, 3)


def _write_imgs(folder, n=2, controls=False):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    ctrl_dir = folder.parent / "ctrl"
    if controls:
        ctrl_dir.mkdir(exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("photo of a thing")
        if controls:
            Image.fromarray(255 - arr).save(ctrl_dir / f"im_{i}.png")
    return ctrl_dir


@pytest.mark.slow
def test_control_lora_training_e2e(tmp_path, capfd):
    """Flux control-lora: img_in expansion + lora train together, the save
    file carries transformer.x_embedder.weight beside the lora keys, and a
    fresh process resumes both."""
    folder = tmp_path / "imgs"
    ctrl_dir = _write_imgs(folder, controls=True)

    def make_cfg(steps):
        return {
            "job": "extension",
            "config": {"name": "cl", "process": [{
                "type": "sd_trainer",
                "training_folder": str(tmp_path / "out"),
                "adapter": {"type": "control_lora", "num_control_images": 1},
                "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                "save": {"save_every": 2, "max_step_saves_to_keep": 2},
                "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                              "resolution": 64, "control_path": str(ctrl_dir)}],
                "train": {"batch_size": 1, "steps": steps,
                          "noise_scheduler": "flowmatch",
                          "timestep_type": "linear",
                          "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                          "ema_config": {"use_ema": False}},
                "model": {"name_or_path": "", "arch": "flux",
                          "model_kwargs": {"size": "tiny"}},
                "sample": {"sample_every": 2, "sample_steps": 2, "width": 64,
                           "height": 64, "prompts": ["a thing --seed 1"]},
            }]},
        }

    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(make_cfg(2)))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    proc = job.processes[0]
    tr = proc._final_state.trainable
    dc = proc.model.dit_config
    assert tr["ctrl"]["img_in"]["w"].shape == (dc.in_channels, dc.hidden_size)
    assert dc.control_channels == dc.in_channels
    # lora skipped img_in (reference ignore_if_contains += x_embedder)
    assert "img_in" not in tr["lora"]
    # save file: reference layout — x_embedder key + lora keys together
    from safetensors import safe_open

    save_path = os.path.join(tmp_path / "out" / "cl", "cl.safetensors")
    with safe_open(save_path, framework="numpy") as f:
        keys = set(f.keys())
    assert X_EMBEDDER_KEY in keys
    assert any(".lora" in k or "lora_" in k for k in keys if k != X_EMBEDDER_KEY)
    # sampling produced an image (control zeros path)
    samples = os.listdir(tmp_path / "out" / "cl" / "samples")
    assert any(f.endswith(".png") for f in samples)
    capfd.readouterr()
    # resume: rerun with more steps — the expansion restores from the file
    p.write_text(yaml.safe_dump(make_cfg(4)))
    job2 = get_job(get_config(p))
    job2.run()
    out = capfd.readouterr().out
    assert "resumed control_lora x_embedder expansion" in out


@pytest.mark.slow
def test_control_lora_inpaint_training_e2e(tmp_path):
    """has_inpainting_input: the control slot carries [masked latents, mask]
    (68 packed ch on tiny-flux's 4-latent-ch scale: base+4)."""
    folder = tmp_path / "imgs"
    _write_imgs(folder)
    cfg = {
        "job": "extension",
        "config": {"name": "cli", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "adapter": {"type": "control_lora", "has_inpainting_input": True,
                        "lora_config": {"type": "lora", "linear": 4,
                                        "linear_alpha": 4}},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear",
                      "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "flux",
                      "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
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
    dc = proc.model.dit_config
    # inpainting expansion: base packed + 4 mask channels
    assert proc._final_state.trainable["ctrl"]["img_in"]["w"].shape[0] == (
        dc.in_channels + 4
    )
