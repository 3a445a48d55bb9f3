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
from ai_toolkit_tpu.data.captions import load_caption_pair, process_caption

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
VIDEO_EXTS = (".mp4", ".webm", ".avi", ".mov")
AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg")


@dataclass
class FileItem:
    path: str
    caption: str
    caption_short: str = ""
    width: int = 0
    height: int = 0
    bucket: tuple[int, int] = (0, 0)  # (w, h) pixel bucket
    resolution: int = 512
    is_reg: bool = False
    mask_path: str | None = None
    control_paths: list[str] = field(default_factory=list)
    dataset_config: DatasetConfig | None = None
    flip: bool = False
    flip_y: bool = False
    unconditional_path: str | None = None  # paired negative image (sliders)
    kind: str = "image"  # image | video | audio
    num_frames: int = 1
    num_samples: int = 0  # audio sample count
    # augmentation state for the CURRENT load cycle (reference
    # AugmentationFileItemDTOMixin: unaugmented_tensor + replayed spatial
    # transforms for controls/masks)
    aug_replay: list = field(default_factory=list)
    unaugmented: np.ndarray | None = None
    _aug_pipe: object = None

    def _augment(self, arr: np.ndarray) -> np.ndarray:
        cfg = self.dataset_config
        self.aug_replay = []
        self.unaugmented = None
        if cfg is None or not getattr(cfg, "augmentations", None):
            return arr
        from ai_toolkit_tpu.data.augmentations import AugmentPipeline

        if self._aug_pipe is None:
            self._aug_pipe = AugmentPipeline(
                cfg.augmentations, cfg.shuffle_augmentations,
                seed=hash(self.path) & 0xFFFFFF,
            )
        self.unaugmented = arr
        out, replay = self._aug_pipe(arr)
        if cfg.replay_transforms:
            self.aug_replay = replay
        return out

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
        if self.flip_y:
            arr = arr[::-1]
        return self._augment(arr)

    def load_video(self) -> np.ndarray:
        """Decode video -> [T, H, W, 3] in [-1, 1], T = self.num_frames
        (uniformly sampled; cf. reference frame extraction,
        DatasetConfig num_frames/fps, dataloader_mixins video path)."""
        import cv2

        cap = cv2.VideoCapture(self.path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
        want = self.num_frames
        idxs = np.linspace(0, max(total - 1, 0), want).round().astype(int)
        frames = []
        pos = 0
        want_set = {}
        for i in idxs:
            want_set.setdefault(int(i), 0)
            want_set[int(i)] += 1
        i = 0
        ok, frame = cap.read()
        last = None
        while ok and len(frames) < want:
            if i in want_set:
                for _ in range(want_set[i]):
                    frames.append(frame)
            last = frame
            i += 1
            ok, frame = cap.read()
        cap.release()
        while len(frames) < want:
            frames.append(last if last is not None else np.zeros((8, 8, 3), np.uint8))
        bw, bh = self.bucket
        out = []
        for f in frames:
            f = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
            fh, fw = f.shape[:2]
            rw, rh, x0, y0 = resize_and_crop_size(fw, fh, bw, bh)
            f = cv2.resize(f, (rw, rh), interpolation=cv2.INTER_CUBIC)[y0 : y0 + bh, x0 : x0 + bw]
            out.append(f)
        arr = np.stack(out).astype(np.float32) / 127.5 - 1.0
        if self.flip:
            arr = arr[:, :, ::-1]
        if self.flip_y:
            arr = arr[:, ::-1]
        return arr

    def load_audio(self, sample_rate: int = 44100, num_samples: int | None = None) -> np.ndarray:
        """Decode audio -> [T, C] float32 in [-1, 1] at sample_rate."""
        from scipy.io import wavfile

        sr, data = wavfile.read(self.path)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        elif data.dtype.kind == "u":
            data = (data.astype(np.float32) - 128) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 1:
            data = np.stack([data, data], axis=-1)
        if sr != sample_rate:  # linear resample
            n_out = int(len(data) * sample_rate / sr)
            x_old = np.linspace(0, 1, len(data))
            x_new = np.linspace(0, 1, n_out)
            data = np.stack([np.interp(x_new, x_old, data[:, c]) for c in range(data.shape[1])], -1)
        if num_samples:
            if len(data) >= num_samples:
                data = data[:num_samples]
            else:
                data = np.pad(data, ((0, num_samples - len(data)), (0, 0)))
        return data.astype(np.float32)

    def load_sidecar_audio(
        self, sample_rate: int, num_samples: int
    ) -> np.ndarray | None:
        """Audio track for a video item: a same-stem sidecar file
        (<stem>.wav) next to the video (reference extracts the embedded
        track via torchaudio; sidecar files keep the host pipeline
        ffmpeg-free). Returns [num_samples, 2] or None."""
        import os

        stem = os.path.splitext(self.path)[0]
        for ext in (".wav",):  # scipy wavfile decoder
            p = stem + ext
            if os.path.isfile(p):
                saved_path = self.path
                try:
                    self.path = p
                    return self.load_audio(sample_rate, num_samples)
                finally:
                    self.path = saved_path
        return None

    def load_unconditional(self) -> np.ndarray | None:
        """Paired negative image at the same bucket geometry (sliders)."""
        if not self.unconditional_path:
            return None
        from PIL import Image

        img = Image.open(self.unconditional_path).convert("RGB")
        bw, bh = self.bucket
        rw, rh, x0, y0 = resize_and_crop_size(img.width, img.height, bw, bh)
        img = img.resize((rw, rh), Image.BICUBIC).crop((x0, y0, x0 + bw, y0 + bh))
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        if self.flip:
            arr = arr[:, ::-1]
        if self.flip_y:
            arr = arr[::-1]
        return arr

    def load_control(self, index: int = 0) -> np.ndarray | None:
        """Control image #index resized to the bucket, [-1,1] float32 HWC."""
        if index >= len(self.control_paths):
            return None
        from PIL import Image

        img = Image.open(self.control_paths[index]).convert("RGB")
        bw, bh = self.bucket
        rw, rh, x0, y0 = resize_and_crop_size(img.width, img.height, bw, bh)
        img = img.resize((rw, rh), Image.BICUBIC).crop((x0, y0, x0 + bw, y0 + bh))
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        if self.flip:
            arr = arr[:, ::-1]
        if self.flip_y:
            arr = arr[::-1]
        if self.aug_replay:
            from ai_toolkit_tpu.data.augmentations import replay_spatial

            arr = replay_spatial(arr, self.aug_replay)
        return arr

    def load_controls(self) -> list[np.ndarray]:
        """All paired control images (multi-reference edit archs — reference
        batch.control_tensor_list, qwen_image_edit_plus.py:270-280)."""
        return [self.load_control(i) for i in range(len(self.control_paths))]

    def load_inpaint_mask(self) -> np.ndarray | None:
        """Keep-area mask [H, W, 1] in [0,1] (1 = keep) from the paired
        inpaint image (reference inpaint_path: RGBA alpha = keep; grayscale
        white = inpaint region)."""
        cfg = self.dataset_config
        ip = getattr(cfg, "inpaint_path", None) if cfg else None
        if not ip:
            return None
        import glob

        from PIL import Image

        stem = os.path.splitext(os.path.basename(self.path))[0]
        cand = None
        for c in sorted(glob.glob(os.path.join(ip, stem + ".*"))):
            if os.path.splitext(c)[1].lower() in IMAGE_EXTS:
                cand = c
                break
        if cand is None:
            return None
        img = Image.open(cand)
        bw, bh = self.bucket
        rw, rh, x0, y0 = resize_and_crop_size(img.width, img.height, bw, bh)
        img = img.resize((rw, rh), Image.BICUBIC).crop((x0, y0, x0 + bw, y0 + bh))
        if img.mode == "RGBA":
            keep = np.asarray(img.split()[-1], np.float32) / 255.0
        else:
            keep = 1.0 - np.asarray(img.convert("L"), np.float32) / 255.0
        if self.flip:
            keep = keep[:, ::-1]
        if self.flip_y:
            keep = keep[::-1]
        arr = keep[..., None]
        if self.aug_replay:
            from ai_toolkit_tpu.data.augmentations import replay_spatial

            arr = replay_spatial(arr, self.aug_replay, is_mask=True)
        return np.ascontiguousarray(arr)

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
        if self.flip_y:
            arr = arr[::-1]
        if self.aug_replay:
            from ai_toolkit_tpu.data.augmentations import replay_spatial

            arr = replay_spatial(arr[..., None], self.aug_replay, is_mask=True)
            return arr
        return arr[..., None]


class FolderDataset:
    """One dataset entry (one DatasetConfig)."""

    def __init__(self, cfg: DatasetConfig, bucket_divisibility: int = 16,
                 trigger_word: str | None = None, seed: int = 42):
        self.cfg = cfg
        if getattr(cfg, "augmentations", None) and (cfg.cache_latents or cfg.cache_latents_to_disk):
            # reference DatasetConfig raises the same way (config_modules.py:1018)
            raise ValueError(
                "augmentations are re-rolled every epoch and cannot be cached — "
                "set cache_latents: false and cache_latents_to_disk: false"
            )
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
        paths: list[tuple[str, str]] = []
        for root, dirs, files in os.walk(folder):
            # auto-generated control maps live in _controls/ — never dataset images
            dirs[:] = [d for d in dirs if d != "_controls"]
            for f in sorted(files):
                lf = f.lower()
                if lf.endswith(IMAGE_EXTS):
                    paths.append((os.path.join(root, f), "image"))
                elif lf.endswith(VIDEO_EXTS):
                    paths.append((os.path.join(root, f), "video"))
                elif lf.endswith(AUDIO_EXTS):
                    paths.append((os.path.join(root, f), "audio"))
        video_stems = {os.path.splitext(p)[0] for p, k in paths if k == "video"}
        if video_stems and any(
            k == "audio" and os.path.splitext(p)[0] in video_stems for p, k in paths
        ):
            # sidecar audio belongs to its video (joint AV), never the item
            # list — even when do_audio is off (a stray standalone-audio item
            # would otherwise hit the video VAE with 2D data)
            if not self.cfg.do_audio:
                print(f"dataset {folder}: ignoring sidecar audio files "
                      "(set do_audio: true to train the joint AV stream)")
            paths = [
                (p, k) for p, k in paths
                if not (k == "audio" and os.path.splitext(p)[0] in video_stems)
            ]
        resolutions = self.cfg.resolution
        for p, kind in paths:
            w = h = 0
            if kind == "image":
                try:
                    with Image.open(p) as im:
                        w, h = im.size
                except Exception:
                    continue
            elif kind == "video":
                try:
                    import cv2

                    cap = cv2.VideoCapture(p)
                    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                    cap.release()
                except Exception:
                    continue
            caption, caption_short = load_caption_pair(
                p, self.cfg.caption_ext, self.cfg.default_caption
            )
            if getattr(self.cfg, "use_short_captions", False) and caption_short:
                # 'caption_short' becomes THE caption (dataloader_mixins.py:335-337)
                caption = caption_short
            mask_path = None
            if self.cfg.mask_path:
                mask_path = os.path.join(self.cfg.mask_path, os.path.basename(p))
            unconditional_path = None
            if self.cfg.unconditional_path:
                up = os.path.join(self.cfg.unconditional_path, os.path.basename(p))
                if os.path.isfile(up):
                    unconditional_path = up
            control_paths = []
            ctrl = self.cfg.control_path
            if ctrl:
                for croot in (ctrl if isinstance(ctrl, list) else [ctrl]):
                    cp = os.path.join(croot, os.path.basename(p))
                    if os.path.isfile(cp):
                        control_paths.append(cp)
            if getattr(self.cfg, "controls", None) and kind == "image":
                # auto-generate + cache control maps (reference
                # ControlCachingMixin / toolkit/control_generator.py)
                from ai_toolkit_tpu.data.control_generator import ControlGenerator

                if not hasattr(self, "_control_gen"):
                    self._control_gen = ControlGenerator()
                for ctype in self.cfg.controls:
                    control_paths.append(self._control_gen.get_or_generate(p, ctype))
            num_samples = 0
            if kind == "audio":
                dur = self.cfg.audio_duration or 10.0
                num_samples = int(dur * self.cfg.audio_sample_rate)
            for res in resolutions:
                for _ in range(max(1, self.cfg.num_repeats)):
                    if kind == "audio":
                        bucket = (0, 0)
                    elif self.cfg.enable_bucketing and self.cfg.buckets and w and h:
                        bucket = get_bucket_for_image_size(w, h, res, self.divisibility)
                    else:
                        bucket = (res, res)
                    flip = kind != "audio" and self.cfg.flip_x and self.rng.random() < 0.5
                    flip_y = kind != "audio" and self.cfg.flip_y and self.rng.random() < 0.5
                    self.items.append(
                        FileItem(
                            path=p, caption=caption, caption_short=caption_short,
                            width=w, height=h, bucket=bucket,
                            resolution=res, is_reg=self.cfg.is_reg, mask_path=mask_path,
                            dataset_config=self.cfg, flip=flip, flip_y=flip_y, kind=kind,
                            control_paths=control_paths,
                            unconditional_path=unconditional_path,
                            num_frames=self.cfg.num_frames if kind == "video" else 1,
                            num_samples=num_samples,
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

    def processed_caption_short(self, item: FileItem) -> str:
        """Short caption: trigger injection only — caption/token dropout are
        skipped for short captions (reference get_caption(short_caption=True),
        dataloader_mixins.py:389,400)."""
        return process_caption(item.caption_short, trigger_word=self.trigger_word)

    def build_batches(self, batch_size: int, shuffle: bool = True) -> list[list[FileItem]]:
        """Group by bucket, batch within buckets, pad the last partial batch by
        repeating items (reference pads the last batch too)."""
        by_bucket: dict[tuple, list[FileItem]] = {}
        for it in self.items:
            # Multi-reference items (qwen_image_edit_plus etc.) must batch with
            # same-count peers: mixed counts would pad short items with blank
            # frames that the model then attends to as real reference latents
            # (the reference varies img_shapes per item instead). 0/1-control
            # items keep sharing batches (blank there means "no control").
            n_ctrl = len(it.control_paths)
            ctrl_key = n_ctrl if n_ctrl > 1 else 0
            by_bucket.setdefault(
                (it.bucket, it.kind, it.num_frames, ctrl_key), []
            ).append(it)
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


def load_pixels(item: FileItem) -> np.ndarray:
    """Kind-dispatched raw-signal load: image [H,W,3] / video [T,H,W,3] /
    audio [T,C]."""
    if item.kind == "video":
        return item.load_video()
    if item.kind == "audio":
        cfg = item.dataset_config
        sr = cfg.audio_sample_rate if cfg else 44100
        return item.load_audio(sr, item.num_samples or None)
    return item.load_image()
