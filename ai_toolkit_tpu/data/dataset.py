"""Folder dataset: scan, bucket, batch.

Host-side replacement for the reference's ``AiToolkitDataset`` + BucketsMixin
(``/root/reference/toolkit/data_loader.py:385``,
``dataloader_mixins.py:186-310``): scans an image folder, assigns every file
to an aspect bucket per configured resolution, and builds per-bucket batches
(so each batch has one static latent shape).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import numpy as np

from ai_toolkit_tpu.config.modules import DatasetConfig
from ai_toolkit_tpu.data.buckets import get_bucket_for_image_size, resize_and_crop_size
from ai_toolkit_tpu.data.captions import load_caption_for, process_caption

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
VIDEO_EXTS = (".mp4", ".webm", ".avi", ".mov")
AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg")


@dataclass
class FileItem:
    path: str
    caption: str
    width: int = 0
    height: int = 0
    bucket: tuple[int, int] = (0, 0)  # (w, h) pixel bucket
    resolution: int = 512
    is_reg: bool = False
    mask_path: str | None = None
    control_paths: list[str] = field(default_factory=list)
    dataset_config: DatasetConfig | None = None
    flip: bool = False

    def load_image(self) -> np.ndarray:
        """Decode, cover-resize and center-crop to bucket; [-1, 1] float32 HWC."""
        from PIL import Image

        img = Image.open(self.path).convert("RGB")
        bw, bh = self.bucket
        rw, rh, x0, y0 = resize_and_crop_size(img.width, img.height, bw, bh)
        img = img.resize((rw, rh), Image.BICUBIC).crop((x0, y0, x0 + bw, y0 + bh))
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        if self.flip:
            arr = arr[:, ::-1]
        return arr

    def load_mask(self) -> np.ndarray | None:
        if not self.mask_path or not os.path.isfile(self.mask_path):
            return None
        from PIL import Image

        m = Image.open(self.mask_path).convert("L")
        bw, bh = self.bucket
        rw, rh, x0, y0 = resize_and_crop_size(m.width, m.height, bw, bh)
        m = m.resize((rw, rh), Image.BICUBIC).crop((x0, y0, x0 + bw, y0 + bh))
        arr = np.asarray(m, np.float32) / 255.0
        if self.flip:
            arr = arr[:, ::-1]
        return arr[..., None]


class FolderDataset:
    """One dataset entry (one DatasetConfig)."""

    def __init__(self, cfg: DatasetConfig, bucket_divisibility: int = 16,
                 trigger_word: str | None = None, seed: int = 42):
        self.cfg = cfg
        self.divisibility = max(bucket_divisibility, cfg.bucket_tolerance if not cfg.buckets else bucket_divisibility)
        self.trigger_word = trigger_word or cfg.trigger_word
        self.rng = random.Random(seed)
        self.items: list[FileItem] = []
        self._scan()

    def _scan(self):
        from PIL import Image

        folder = self.cfg.folder_path
        if not os.path.isdir(folder):
            raise FileNotFoundError(f"dataset folder not found: {folder}")
        paths = []
        for root, _, files in os.walk(folder):
            for f in sorted(files):
                if f.lower().endswith(IMAGE_EXTS):
                    paths.append(os.path.join(root, f))
        resolutions = self.cfg.resolution
        for p in paths:
            try:
                with Image.open(p) as im:
                    w, h = im.size
            except Exception:
                continue
            caption = load_caption_for(p, self.cfg.caption_ext, self.cfg.default_caption)
            mask_path = None
            if self.cfg.mask_path:
                mask_path = os.path.join(self.cfg.mask_path, os.path.basename(p))
            for res in resolutions:
                for _ in range(max(1, self.cfg.num_repeats)):
                    if self.cfg.enable_bucketing and self.cfg.buckets:
                        bucket = get_bucket_for_image_size(w, h, res, self.divisibility)
                    else:
                        bucket = (res, res)
                    flip = self.cfg.flip_x and self.rng.random() < 0.5
                    self.items.append(
                        FileItem(
                            path=p, caption=caption, width=w, height=h, bucket=bucket,
                            resolution=res, is_reg=self.cfg.is_reg, mask_path=mask_path,
                            dataset_config=self.cfg, flip=flip,
                        )
                    )

    def processed_caption(self, item: FileItem) -> str:
        return process_caption(
            item.caption,
            trigger_word=self.trigger_word,
            caption_dropout_rate=self.cfg.caption_dropout_rate,
            token_dropout_rate=self.cfg.token_dropout_rate,
            shuffle_tokens=self.cfg.shuffle_tokens or self.cfg.caption_shuffle,
            keep_tokens=self.cfg.keep_tokens,
            rng=self.rng,
        )

    def build_batches(self, batch_size: int, shuffle: bool = True) -> list[list[FileItem]]:
        """Group by bucket, batch within buckets, pad the last partial batch by
        repeating items (reference pads the last batch too)."""
        by_bucket: dict[tuple[int, int], list[FileItem]] = {}
        for it in self.items:
            by_bucket.setdefault(it.bucket, []).append(it)
        batches = []
        for bucket, items in sorted(by_bucket.items()):
            if shuffle:
                self.rng.shuffle(items)
            for i in range(0, len(items), batch_size):
                chunk = items[i : i + batch_size]
                while len(chunk) < batch_size:
                    chunk = chunk + chunk[: batch_size - len(chunk)]
                batches.append(chunk)
        if shuffle:
            self.rng.shuffle(batches)
        return batches
