"""DataLoader: epochs of bucket-batches with background prefetch.

Replaces the reference's torch DataLoader + DTO collation
(``/root/reference/toolkit/data_transfer_object/data_loader.py:188``,
``data_loader.py:664``) with a plain host-side iterator producing numpy
batches (static shape per bucket), prefetched on a thread so image decode /
cache reads overlap with the device step. Epoch boundaries re-shuffle and
re-batch (the reference's ``trigger_dataloader_setup_epoch``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from ai_toolkit_tpu.config.modules import DatasetConfig
from ai_toolkit_tpu.data.caching import load_cached_latent
from ai_toolkit_tpu.data.dataset import FileItem, FolderDataset, load_pixels


def _load_paired_image(item: FileItem, folder: str, fallback: np.ndarray) -> np.ndarray:
    """Find <folder>/<stem>.<any image ext>, resized to the item's bucket;
    fall back to the training image when absent."""
    import glob
    import os

    from PIL import Image

    stem = os.path.splitext(os.path.basename(item.path))[0]
    for cand in sorted(glob.glob(os.path.join(folder, stem + ".*"))):
        if os.path.splitext(cand)[1].lower() in (".png", ".jpg", ".jpeg", ".webp", ".bmp"):
            img = Image.open(cand).convert("RGB").resize(
                (fallback.shape[1], fallback.shape[0]), Image.BICUBIC
            )
            return np.asarray(img, np.float32) / 127.5 - 1.0
    return fallback


class DataLoader:
    def __init__(
        self,
        datasets: list[FolderDataset],
        batch_size: int,
        latent_cache_dir: str | None = None,
        encode_fn: Callable[[np.ndarray], np.ndarray] | None = None,
        prefetch: int = 2,
        seed: int = 42,
        want_pixels: bool = False,
    ):
        self.datasets = datasets
        self.batch_size = batch_size
        self.latent_cache_dir = latent_cache_dir
        self.encode_fn = encode_fn
        self.prefetch = prefetch
        self.want_pixels = want_pixels
        self.epoch = 0
        if latent_cache_dir is None and encode_fn is None:
            raise ValueError("need latent_cache_dir (cached) or encode_fn (on-the-fly)")

    def __len__(self):
        n = 0
        for ds in self.datasets:
            n += len(ds.build_batches(self.batch_size, shuffle=False))
        return n

    def _load_batch(self, ds: FolderDataset, batch: list[FileItem]) -> dict:
        out: dict = {"bucket": batch[0].bucket}
        imgs = None
        if self.latent_cache_dir is not None:
            lat = np.stack(
                [load_cached_latent(it, self.latent_cache_dir) for it in batch]
            )
        else:
            imgs = np.stack([load_pixels(it) for it in batch])
            lat = np.asarray(self.encode_fn(imgs))
        out["latents"] = lat.astype(np.float32)
        if self.want_pixels and batch[0].kind == "image":
            # reuse the already-loaded (and possibly augmented) images so the
            # latents and pixels views of one batch agree
            out["pixels"] = (
                imgs if imgs is not None else np.stack([load_pixels(it) for it in batch])
            )
            if ds.cfg.clip_image_path:
                # paired vision-encoder images (same stem, any extension;
                # reference dataloader clip_image_path)
                out["clip_pixels"] = np.stack(
                    [_load_paired_image(it, ds.cfg.clip_image_path, out["pixels"][i])
                     for i, it in enumerate(batch)]
                )
        if getattr(ds.cfg, "clip_image_augmentations", None) and "clip_pixels" in out:
            # separate photometric pipeline for vision-encoder inputs
            # (reference clip_image_augmentations)
            from ai_toolkit_tpu.data.augmentations import AugmentPipeline

            if not hasattr(self, "_clip_aug"):
                self._clip_aug = AugmentPipeline(
                    ds.cfg.clip_image_augmentations,
                    ds.cfg.clip_image_shuffle_augmentations,
                )
            out["clip_pixels"] = np.stack(
                [self._clip_aug(p)[0] for p in out["clip_pixels"]]
            )
        unaug = [it.unaugmented for it in batch]
        if any(u is not None for u in unaug):
            # pre-augmentation images (reference unaugmented_tensor; zeros for
            # items without augs, matching the reference collator)
            base = next(u for u in unaug if u is not None)
            out["unaugmented_pixels"] = np.stack(
                [u if u is not None else np.zeros_like(base) for u in unaug]
            )
        if ds.cfg.do_i2v and batch[0].kind == "video":
            out["first_frame"] = np.stack([it.load_video()[0] for it in batch])
        if ds.cfg.do_audio and batch[0].kind == "video":
            # joint AV (LTX-2): sidecar audio clipped to the video duration
            sr = ds.cfg.audio_sample_rate
            dur = ds.cfg.audio_duration or (
                batch[0].num_frames / float(ds.cfg.fps or 16)
            )
            n = int(dur * sr)
            wavs = [it.load_sidecar_audio(sr, n) for it in batch]
            out["audio_waveform"] = np.stack(
                [w if w is not None else np.zeros((n, 2), np.float32) for w in wavs]
            )
        out["captions"] = [ds.processed_caption(it) for it in batch]
        out["captions_short"] = [ds.processed_caption_short(it) for it in batch]
        uncond = [it.load_unconditional() for it in batch]
        if all(u is not None for u in uncond) and uncond:
            out["unconditional_pixels"] = np.stack(uncond)
        controls = [it.load_control() for it in batch]
        if any(c is not None for c in controls):
            bw, bh = batch[0].bucket
            blank = np.zeros((bh, bw, 3), np.float32)
            out["control_pixels"] = np.stack([c if c is not None else blank for c in controls])
            n_ctrl = max(len(it.control_paths) for it in batch)
            if n_ctrl > 1:
                # multi-reference edit conditioning (qwen_image_edit_plus):
                # [B, N, H, W, 3], short items zero-padded (static N per batch)
                multi, counts = [], []
                for it in batch:
                    cs = it.load_controls()
                    counts.append(sum(1 for c in cs if c is not None))
                    cs += [blank] * (n_ctrl - len(cs))
                    multi.append(np.stack([c if c is not None else blank for c in cs]))
                out["control_pixels_multi"] = np.stack(multi)
                # per-item number of REAL references; downstream masks padded
                # slots out of attention (reference varies img_shapes per item
                # so short items never attend to phantom refs)
                out["control_counts"] = np.asarray(counts, np.int32)
        inp = [it.load_inpaint_mask() for it in batch]
        if any(m is not None for m in inp):
            bw, bh = batch[0].bucket
            keep_all = np.ones((bh, bw, 1), np.float32)  # no file -> keep everything
            out["inpaint_keep"] = np.stack([m if m is not None else keep_all for m in inp])
        masks = [it.load_mask() for it in batch]
        if any(m is not None for m in masks):
            bw, bh = batch[0].bucket
            full = np.ones((bh, bw, 1), np.float32)
            out["pixel_mask"] = np.stack([m if m is not None else full for m in masks])
        import hashlib

        out["noise_seed"] = np.array(
            [
                int(
                    hashlib.md5(
                        (it.path + ("_fx" if it.flip else "") + ("_fy" if it.flip_y else "")).encode()
                    ).hexdigest(),
                    16,
                )
                & 0x7FFFFFFF
                for it in batch
            ],
            np.int32,
        )
        cfg = ds.cfg
        mult = cfg.loss_multiplier * (cfg.network_weight if cfg.is_reg else 1.0)
        out["loss_multiplier"] = np.full((len(batch),), mult, np.float32)
        out["is_reg"] = batch[0].is_reg
        return out

    def _epoch_plan(self) -> list[tuple[FolderDataset, list[FileItem]]]:
        plan: list[tuple[FolderDataset, list[FileItem]]] = []
        for ds in self.datasets:
            for b in ds.build_batches(self.batch_size, shuffle=True):
                plan.append((ds, b))
        rng = np.random.default_rng(self.epoch)
        order = rng.permutation(len(plan))
        return [plan[i] for i in order]

    def epoch_iter(self) -> Iterator[dict]:
        """One epoch with threaded prefetch."""
        plan = self._epoch_plan()
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for ds, batch in plan:
                    q.put(self._load_batch(ds, batch))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def __iter__(self) -> Iterator[dict]:
        """Endless stream over epochs (the train loop counts steps, not epochs)."""
        while True:
            yield from self.epoch_iter()


def build_dataloader(
    dataset_configs: list[DatasetConfig],
    batch_size: int,
    bucket_divisibility: int,
    trigger_word: str | None = None,
    latent_cache_dir: str | None = None,
    encode_fn=None,
    seed: int = 42,
    want_pixels: bool = False,
) -> DataLoader:
    datasets = [
        FolderDataset(cfg, bucket_divisibility, trigger_word, seed=seed + i)
        for i, cfg in enumerate(dataset_configs)
    ]
    return DataLoader(
        datasets, batch_size, latent_cache_dir=latent_cache_dir, encode_fn=encode_fn, seed=seed,
        want_pixels=want_pixels,
    )
