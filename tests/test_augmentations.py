"""Augmentation pipeline (reference dataloader_mixins.py:1380-1470 Augments/
ReplayCompose semantics): photometric + spatial ops, spatial replay onto
controls/masks, dataset + loader integration, and loss_target wiring."""

import numpy as np
import pytest

from ai_toolkit_tpu.data.augmentations import AugmentPipeline, replay_spatial


def _img(h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w, 3), np.float32) * 2 - 1).astype(np.float32)


def test_photometric_ops_preserve_shape():
    specs = [
        {"method": m, "params": {"p": 1.0}}
        for m in (
            "ColorJitter", "RandomBrightnessContrast", "HueSaturationValue",
            "RandomGamma", "GaussNoise", "GaussianBlur", "Blur", "MotionBlur",
            "ToGray", "ChannelShuffle", "InvertImg", "Solarize", "Posterize",
            "Equalize", "Downscale", "ImageCompression", "Sharpen", "CLAHE",
        )
    ]
    pipe = AugmentPipeline(specs, seed=1)
    img = _img()
    out, replay = pipe(img)
    assert out.shape == img.shape and out.dtype == np.float32
    assert replay == []  # photometric ops are never replayed
    assert not np.allclose(out, img)
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_unknown_method_raises():
    with pytest.raises(ValueError, match="NotARealAug"):
        AugmentPipeline([{"method": "NotARealAug"}])


def test_spatial_replay_matches_main_image():
    pipe = AugmentPipeline(
        [{"method": "HorizontalFlip", "params": {"p": 1.0}},
         {"method": "Rotate", "params": {"limit": 25, "p": 1.0}}],
        seed=3,
    )
    img = _img()
    out, replay = pipe(img)
    assert [n for n, _ in replay] == ["HorizontalFlip", "Rotate"]
    # replaying the trace on the same input reproduces the augmented image
    np.testing.assert_allclose(replay_spatial(img, replay), out, atol=1e-5)
    # masks go through nearest-neighbour and stay binary
    mask = (np.arange(32)[:, None, None] < 16).astype(np.float32) * np.ones((32, 32, 1), np.float32)
    m2 = replay_spatial(mask, replay, is_mask=True)
    assert m2.shape == mask.shape
    assert set(np.unique(m2)).issubset({0.0, 1.0})


def test_grid_and_optical_distortion_run():
    pipe = AugmentPipeline(
        [{"method": "GridDistortion", "params": {"p": 1.0}},
         {"method": "OpticalDistortion", "params": {"p": 1.0, "distort_limit": 0.3}}],
        seed=5,
    )
    img = _img(64, 48)
    out, replay = pipe(img)
    assert out.shape == img.shape and len(replay) == 2


def _make_dataset(tmp_path, **cfg_kwargs):
    from PIL import Image

    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.dataset import FolderDataset

    folder = tmp_path / "imgs"
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"thing {i}")
    cfg = DatasetConfig(folder_path=str(folder), resolution=[64], **cfg_kwargs)
    return FolderDataset(cfg, 16)


def test_dataset_augmentation_and_unaugmented(tmp_path):
    ds = _make_dataset(
        tmp_path,
        cache_latents=False, cache_latents_to_disk=False,
        augmentations=[{"method": "HorizontalFlip", "params": {"p": 1.0}}],
    )
    it = ds.items[0]
    out = it.load_image()
    assert it.unaugmented is not None
    np.testing.assert_allclose(out, it.unaugmented[:, ::-1], atol=1e-6)
    # spatial replay applies the same flip to the mask path
    assert [n for n, _ in it.aug_replay] == ["HorizontalFlip"]


def test_augmentations_with_latent_cache_raise(tmp_path):
    with pytest.raises(ValueError, match="cache"):
        _make_dataset(
            tmp_path,
            augmentations=[{"method": "HorizontalFlip", "params": {"p": 1.0}}],
        )


def test_flip_y_loads_vertically_flipped(tmp_path):
    ds = _make_dataset(tmp_path)
    it = ds.items[0]
    base = it.load_image()
    it.flip_y = True
    np.testing.assert_allclose(it.load_image(), base[::-1], atol=1e-6)


def test_loader_emits_unaugmented_pixels(tmp_path):
    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.loader import build_dataloader

    ds = _make_dataset(
        tmp_path,
        cache_latents=False, cache_latents_to_disk=False,
        augmentations=[{"method": "HorizontalFlip", "params": {"p": 1.0}}],
    )
    loader = build_dataloader(
        [ds.cfg], batch_size=2, bucket_divisibility=16,
        encode_fn=lambda imgs: imgs[..., :1],  # fake 1-channel "latents"
    )
    batch = next(iter(loader))
    assert "unaugmented_pixels" in batch
    np.testing.assert_allclose(
        batch["unaugmented_pixels"][:, :, ::-1, :1], batch["latents"], atol=1e-6
    )


def test_loss_target_source_oracle_is_zero():
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    latents = jax.random.normal(jax.random.key(1), (2, 4, 4, 2))

    def oracle(variables, noisy, t, cond):
        tv = t.reshape(t.shape + (1,) * (noisy.ndim - t.ndim))
        return (noisy - latents) / tv

    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": {}}, {"lora": {"w": jnp.zeros((2,))}}, tx)
    cfg = TrainStepConfig(timestep_type="linear", loss_target_mode="source")
    step = jax.jit(make_train_step(oracle, FlowMatchSchedule(), cfg))
    _, m = step(state, {"latents": latents}, jax.random.key(0))
    assert float(m["loss"]) < 1e-4

    # 'unaugmented' swaps the target: oracle now mismatches -> loss > 0
    cfg2 = TrainStepConfig(timestep_type="linear", loss_target_mode="unaugmented")
    step2 = jax.jit(make_train_step(oracle, FlowMatchSchedule(), cfg2))
    other = latents + 1.0
    _, m2 = step2(
        state, {"latents": latents, "unaugmented_latents": other}, jax.random.key(0)
    )
    assert float(m2["loss"]) > 0.1

    with pytest.raises(ValueError, match="loss_target"):
        make_train_step(oracle, FlowMatchSchedule(), TrainStepConfig(loss_target_mode="bogus"))
