import os
import random

import numpy as np
import pytest
from PIL import Image

from ai_toolkit_tpu.config.modules import DatasetConfig
from ai_toolkit_tpu.data.buckets import get_bucket_for_image_size, resize_and_crop_size
from ai_toolkit_tpu.data.caching import TextEmbedCache, cache_latents, load_cached_latent
from ai_toolkit_tpu.data.captions import process_caption
from ai_toolkit_tpu.data.dataset import FolderDataset
from ai_toolkit_tpu.data.loader import build_dataloader


def make_image_folder(tmp_path, sizes, captions=True):
    folder = tmp_path / "imgs"
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.png")
        if captions:
            (folder / f"img_{i}.txt").write_text(f"caption {i}, tag_a, tag_b")
    return str(folder)


def test_bucket_algorithm():
    # square image at its own resolution
    assert get_bucket_for_image_size(512, 512, 512, 8) == (512, 512)
    # wide image stays under pixel budget and divisible
    w, h = get_bucket_for_image_size(1920, 1080, 512, 8)
    assert w % 8 == 0 and h % 8 == 0
    assert w * h <= 512 * 512
    assert abs((w / h) - (1920 / 1080)) < 0.1
    # small image is not upscaled beyond its own pixels
    w, h = get_bucket_for_image_size(256, 256, 512, 8)
    assert (w, h) == (256, 256)
    # divisibility 16 and 64
    for d in (16, 64):
        w, h = get_bucket_for_image_size(1000, 700, 512, d)
        assert w % d == 0 and h % d == 0


def test_resize_crop_covers():
    rw, rh, x0, y0 = resize_and_crop_size(1920, 1080, 512, 288)
    assert rw >= 512 and rh >= 288
    assert x0 >= 0 and y0 >= 0


def test_caption_processing():
    rng = random.Random(0)
    out = process_caption("a photo of [trigger], smiling", trigger_word="sks")
    assert out == "a photo of sks, smiling"
    out = process_caption("no trigger here", trigger_word="sks")
    assert out.startswith("sks, ")
    out = process_caption("a, b, c", caption_dropout_rate=1.0, rng=rng)
    assert out == ""
    out = process_caption("a, b, c, d", shuffle_tokens=True, keep_tokens=1, rng=random.Random(1))
    assert out.startswith("a")
    assert set(t.strip() for t in out.split(",")) == {"a", "b", "c", "d"}


def test_folder_dataset_and_batches(tmp_path):
    folder = make_image_folder(tmp_path, [(512, 512), (512, 512), (1024, 512), (300, 400)])
    cfg = DatasetConfig.from_dict({"folder_path": folder, "resolution": 256})
    ds = FolderDataset(cfg, bucket_divisibility=16)
    assert len(ds.items) == 4
    buckets = {it.bucket for it in ds.items}
    assert all(w % 16 == 0 and h % 16 == 0 for w, h in buckets)
    batches = ds.build_batches(batch_size=2)
    # every batch has a single bucket and is exactly batch_size
    for b in batches:
        assert len(b) == 2
        assert len({it.bucket for it in b}) == 1


def test_multi_resolution_expands_items(tmp_path):
    folder = make_image_folder(tmp_path, [(512, 512)])
    cfg = DatasetConfig.from_dict({"folder_path": folder, "resolution": [256, 512], "num_repeats": 2})
    ds = FolderDataset(cfg, bucket_divisibility=16)
    assert len(ds.items) == 4  # 2 resolutions x 2 repeats


def test_latent_cache_roundtrip(tmp_path):
    folder = make_image_folder(tmp_path, [(256, 256), (256, 256), (512, 256)])
    cfg = DatasetConfig.from_dict({"folder_path": folder, "resolution": 256})
    ds = FolderDataset(cfg, bucket_divisibility=16)
    cache_dir = str(tmp_path / "cache")

    def fake_encode(imgs):  # [B,H,W,3] -> [B,H/8,W/8,4]
        b, h, w, _ = imgs.shape
        return np.mean(imgs.reshape(b, h // 8, 8, w // 8, 8, 3), axis=(2, 4))[..., :3].repeat(2, -1)[..., :4]

    mem = cache_latents(ds.items, fake_encode, cache_dir, batch_size=2)
    assert len(mem) == 3
    # second call: everything cached, nothing re-encoded
    mem2 = cache_latents(ds.items, fake_encode, cache_dir, batch_size=2)
    assert len(mem2) == 0
    lat = load_cached_latent(ds.items[0], cache_dir)
    bw, bh = ds.items[0].bucket
    assert lat.shape == (bh // 8, bw // 8, 4)


def test_dataloader_end_to_end(tmp_path):
    folder = make_image_folder(tmp_path, [(256, 256)] * 5)
    cfg = DatasetConfig.from_dict(
        {"folder_path": folder, "resolution": 128, "caption_dropout_rate": 0.0}
    )

    def fake_encode(imgs):
        b, h, w, _ = imgs.shape
        return np.zeros((b, h // 8, w // 8, 4), np.float32)

    dl = build_dataloader([cfg], batch_size=2, bucket_divisibility=16, trigger_word="sks",
                          encode_fn=fake_encode)
    batches = list(dl.epoch_iter())
    assert len(batches) == 3  # ceil(5/2) with padding
    b0 = batches[0]
    assert b0["latents"].shape == (2, 16, 16, 4)
    assert all("sks" in c for c in b0["captions"])
    assert b0["loss_multiplier"].shape == (2,)
    # endless iterator crosses epochs
    it = iter(dl)
    for _ in range(7):
        next(it)


def test_text_embed_cache():
    calls = []

    def encode(prompts):
        calls.append(list(prompts))
        return {"txt": np.stack([np.full((4,), float(len(p))) for p in prompts])}

    cache = TextEmbedCache(encode)
    out = cache.get(["aa", "bbb", "aa"])
    assert out["txt"].shape == (3, 4)
    assert out["txt"][0][0] == 2.0 and out["txt"][1][0] == 3.0 and out["txt"][2][0] == 2.0
    cache.get(["aa", "bbb"])
    assert len(calls) == 1  # fully memoized


def test_native_loader_matches_pil(tmp_path):
    """Native C++ decode+resize path agrees with the PIL path."""
    pytest.importorskip("ctypes")
    from ai_toolkit_tpu.data.native import load_image_batch

    folder = make_image_folder(tmp_path, [(300, 200), (640, 480)])
    paths = sorted(str(p) for p in (tmp_path / "imgs").glob("*.png"))
    out = load_image_batch(paths, 128, 96)
    if out is None:
        pytest.skip("native loader unavailable (no toolchain)")
    assert out.shape == (2, 96, 128, 3)
    from ai_toolkit_tpu.data.buckets import resize_and_crop_size
    from PIL import Image as PILImage

    img = PILImage.open(paths[0]).convert("RGB")
    rw, rh, x0, y0 = resize_and_crop_size(img.width, img.height, 128, 96)
    ref = (
        np.asarray(img.resize((rw, rh), PILImage.BICUBIC).crop((x0, y0, x0 + 128, y0 + 96)),
                   np.float32) / 127.5 - 1
    )
    assert np.abs(ref - out[0]).mean() < 0.01


def test_control_generator_types(tmp_path):
    """Auto control maps: deterministic classical generators + caching."""
    import numpy as np
    from PIL import Image

    from ai_toolkit_tpu.data.control_generator import CONTROL_TYPES, ControlGenerator

    arr = np.full((64, 48, 3), 110, dtype=np.uint8)  # uniform background
    arr[16:40, 12:36] = [200, 30, 30]  # a "foreground" block
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)

    gen = ControlGenerator()
    for ctype in CONTROL_TYPES:
        out = gen.get_or_generate(p, ctype)
        assert out.endswith(("png", "jpg"))
        img = Image.open(out)
        assert img.size == (48, 64)
        if ctype == "inpaint":
            assert img.mode == "RGBA"
            a = np.asarray(img)[..., 3]
            assert (a == 0).any() and (a == 255).any()  # some region erased
        if ctype == "mask":
            m = np.asarray(img.convert("L"))
            # the red block should be foreground
            assert m[28, 24] == 255 and m[2, 2] == 0
        # cached: second call returns the same file without regenerating
        mtime = os.path.getmtime(out)
        assert gen.get_or_generate(p, ctype) == out
        assert os.path.getmtime(out) == mtime

    # model hook overrides the classical path
    gen2 = ControlGenerator(cache_subdir="_controls2")
    gen2.set_model_fn("depth", lambda im: np.full(im.shape[:2], 7, np.uint8))
    out = gen2.get_or_generate(p, "depth")
    assert (np.asarray(Image.open(out).convert("L")) == 7).all()


def test_dataset_controls_autogenerate(tmp_path):
    import numpy as np
    from PIL import Image

    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.dataset import FolderDataset

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("x")
    ds = FolderDataset(
        DatasetConfig(folder_path=str(folder), caption_ext="txt", resolution=[64],
                      controls=["line", "depth"]),
        bucket_divisibility=16,
    )
    assert len(ds.items) == 2
    for item in ds.items:
        assert len(item.control_paths) == 2
        assert all(os.path.isfile(cp) for cp in item.control_paths)
        assert "_controls" in item.control_paths[0]
    # generated maps are not re-listed as dataset images on a rebuild
    ds2 = FolderDataset(
        DatasetConfig(folder_path=str(folder), caption_ext="txt", resolution=[64]),
        bucket_divisibility=16,
    )
    assert len(ds2.items) == 2


def test_clip_vision_cache_roundtrip(tmp_path):
    import numpy as np
    from PIL import Image

    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.caching import (
        cache_clip_vision,
        load_cached_clip_vision,
    )
    from ai_toolkit_tpu.data.dataset import FolderDataset

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("x")
    ds = FolderDataset(
        DatasetConfig(folder_path=str(folder), caption_ext="txt", resolution=[64]),
        bucket_divisibility=16,
    )

    def fake_encode(px):
        b = px.shape[0]
        return np.full((b, 5, 8), px.mean()), np.full((b, 8), px.mean())

    cache_dir = str(tmp_path / "clipcache")
    n = cache_clip_vision(ds.items, fake_encode, cache_dir)
    assert n == 3
    tokens, pooled = load_cached_clip_vision(ds.items[0], cache_dir)
    assert tokens.shape == (5, 8) and pooled.shape == (8,)
    # second run: everything cached
    assert cache_clip_vision(ds.items, fake_encode, cache_dir) == 0


def test_multi_ref_control_counts_never_mix(tmp_path):
    # Items with different multi-reference control counts must not share a
    # batch: a mixed batch would pad short items with blank frames that get
    # encoded and attended to as real reference latents (ADVICE r3, medium).
    folder = make_image_folder(tmp_path, [(512, 512)] * 6)
    ctrl1 = tmp_path / "ctrl1"
    ctrl2 = tmp_path / "ctrl2"
    ctrl1.mkdir()
    ctrl2.mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(ctrl1 / f"img_{i}.png")
        if i < 3:  # only half the items have a second reference
            Image.fromarray(arr).save(ctrl2 / f"img_{i}.png")
    cfg = DatasetConfig.from_dict(
        {
            "folder_path": folder,
            "resolution": 256,
            "control_path": [str(ctrl1), str(ctrl2)],
        }
    )
    ds = FolderDataset(cfg, bucket_divisibility=16)
    counts = {len(it.control_paths) for it in ds.items}
    assert counts == {1, 2}
    for b in ds.build_batches(batch_size=2):
        ns = {len(it.control_paths) for it in b}
        assert len(ns) == 1, f"mixed control counts in one batch: {ns}"
