"""Automatic control-map generation for datasets (depth / line / pose /
inpaint / mask).

Parity target: the reference's ``toolkit/control_generator.py`` (ControlTypes
``config_modules.py:909``, ControlCachingMixin ``dataloader_mixins.py:2351``):
when a dataset config lists ``controls: [...]``, a control image is generated
once per source image and cached beside the dataset, then fed through the
normal control-image path at batch time.

The reference downloads pretrained annotators (depth, DWpose, lineart,
BiRefNet matting). This environment has no egress, so each type ships a
deterministic *classical* implementation that keeps the full pipeline
trainable offline, plus a hook (``set_model_fn``) where a real annotator can
be plugged in when weights are available locally:

- line     Sobel gradient magnitude -> white-line-on-black sketch.
- depth    multi-scale blurred luminance pseudo-depth (bright/low-detail =
           far), normalized per image.
- pose     classical fallback: high-contrast edge skeleton (placeholder until
           a local pose model is provided; clearly NOT DWpose output).
- mask     saliency-style foreground mask: distance from the median border
           color, Otsu-thresholded, single channel.
- inpaint  RGBA of the source with the foreground (mask) region erased
           (alpha=0), matching the reference's erased-region convention
           (control_generator.py:142-151).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
from PIL import Image, ImageFilter

CONTROL_TYPES = ("depth", "line", "pose", "inpaint", "mask", "sapiens2_mask")


def _to_gray(arr: np.ndarray) -> np.ndarray:
    return arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114


def _sobel_mag(gray: np.ndarray) -> np.ndarray:
    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    gx[:, 1:-1] = gray[:, 2:] - gray[:, :-2]
    gy[1:-1, :] = gray[2:, :] - gray[:-2, :]
    return np.sqrt(gx * gx + gy * gy)


def _otsu_threshold(x: np.ndarray) -> float:
    hist, edges = np.histogram(x.reshape(-1), bins=64)
    total = x.size
    best_t, best_var = float(edges[32]), -1.0
    cum = np.cumsum(hist)
    cum_mean = np.cumsum(hist * (edges[:-1] + edges[1:]) * 0.5)
    for i in range(1, 63):
        w0 = cum[i] / total
        w1 = 1.0 - w0
        if w0 < 1e-6 or w1 < 1e-6:
            continue
        m0 = cum_mean[i] / max(cum[i], 1)
        m1 = (cum_mean[-1] - cum_mean[i]) / max(total - cum[i], 1)
        var = w0 * w1 * (m0 - m1) ** 2
        if var > best_var:
            best_var, best_t = var, float(edges[i + 1])
    return best_t


class ControlGenerator:
    """Generates + caches control maps. Model hooks override the classical
    fallbacks: ``gen.set_model_fn('depth', fn)`` with fn(np.uint8 HWC) ->
    np.uint8 map."""

    def __init__(self, cache_subdir: str = "_controls"):
        self.cache_subdir = cache_subdir
        self._model_fns: dict[str, Callable] = {}

    def set_model_fn(self, control_type: str, fn: Callable):
        self._model_fns[control_type] = fn

    def control_save_path(self, img_path: str, control_type: str) -> str:
        d = os.path.join(os.path.dirname(img_path), self.cache_subdir)
        stem = os.path.splitext(os.path.basename(img_path))[0]
        # inpaint needs alpha; mask is near-binary -> lossless (reference
        # uses webp for these, control_generator.py:82-89)
        ext = "png" if control_type in ("inpaint", "mask", "sapiens2_mask") else "jpg"
        return os.path.join(d, f"{stem}_{control_type}.{ext}")

    def get_or_generate(self, img_path: str, control_type: str) -> str:
        if control_type not in CONTROL_TYPES:
            raise ValueError(f"unknown control type '{control_type}'; known: {CONTROL_TYPES}")
        out = self.control_save_path(img_path, control_type)
        if os.path.isfile(out):
            return out
        os.makedirs(os.path.dirname(out), exist_ok=True)
        img = Image.open(img_path).convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        if control_type in self._model_fns:
            result = self._model_fns[control_type](np.asarray(img))
            Image.fromarray(result).save(out)
            return out
        getattr(self, f"_gen_{control_type}")(img, arr).save(out)
        return out

    # ---- classical generators ----

    def _gen_line(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        mag = _sobel_mag(_to_gray(arr))
        mag = mag / max(float(mag.max()), 1e-6)
        return Image.fromarray((np.clip(mag * 2.0, 0, 1) * 255).astype(np.uint8)).convert("RGB")

    def _gen_depth(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        g = Image.fromarray((_to_gray(arr) * 255).astype(np.uint8))
        far = np.asarray(g.filter(ImageFilter.GaussianBlur(16)), np.float32) / 255.0
        near = np.asarray(g.filter(ImageFilter.GaussianBlur(2)), np.float32) / 255.0
        detail = np.abs(near - far)
        # more local detail -> nearer; blurred-bright -> farther
        depth = 1.0 - (0.6 * far + 0.4 * (1.0 - detail / max(float(detail.max()), 1e-6)))
        depth = (depth - depth.min()) / max(float(depth.max() - depth.min()), 1e-6)
        return Image.fromarray((depth * 255).astype(np.uint8)).convert("RGB")

    def _gen_pose(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        # placeholder skeleton: strongest-edge structure on black background
        mag = _sobel_mag(_to_gray(arr))
        t = _otsu_threshold(mag)
        sk = (mag > 2.0 * t).astype(np.uint8) * 255
        return Image.fromarray(sk).convert("RGB")

    def _foreground_mask(self, arr: np.ndarray) -> np.ndarray:
        h, w, _ = arr.shape
        border = np.concatenate([
            arr[0].reshape(-1, 3), arr[-1].reshape(-1, 3),
            arr[:, 0].reshape(-1, 3), arr[:, -1].reshape(-1, 3),
        ])
        bg = np.median(border, axis=0)
        dist = np.sqrt(((arr - bg[None, None]) ** 2).sum(-1))
        t = _otsu_threshold(dist)
        return (dist > t).astype(np.uint8)

    def _gen_mask(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        m = self._foreground_mask(arr) * 255
        return Image.fromarray(m.astype(np.uint8), mode="L")

    def _gen_sapiens2_mask(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        """Sapiens2 human matting (reference control_generator.py:225-236).

        Uses the exact flax Sapiens2Matting (models/sapiens2.py) when local
        weights exist (AIT_SAPIENS2_PATH, or sapiens2_1b_matting.safetensors
        under AIT_MODELS_DIR/sapiens2 — the file the reference hub-downloads);
        otherwise falls back to the classical foreground mask, loudly."""
        if not hasattr(self, "_sapiens"):
            path = os.environ.get("AIT_SAPIENS2_PATH") or os.path.join(
                os.environ.get("AIT_MODELS_DIR", "models"), "sapiens2",
                "sapiens2_1b_matting.safetensors",
            )
            if os.path.isfile(path):
                from ai_toolkit_tpu.models.sapiens2 import import_sapiens2_matting

                self._sapiens = import_sapiens2_matting(path)
            else:
                print(f"sapiens2_mask: no local weights at {path!r} "
                      "(set AIT_SAPIENS2_PATH) — using the classical "
                      "foreground-mask fallback")
                self._sapiens = None
        if self._sapiens is None:
            return self._gen_mask(img, arr)
        return self._sapiens(img)

    def _gen_inpaint(self, img: Image.Image, arr: np.ndarray) -> Image.Image:
        m = self._foreground_mask(arr)
        rgba = np.concatenate(
            [np.asarray(img, np.uint8), ((1 - m) * 255).astype(np.uint8)[..., None]], axis=-1
        )
        return Image.fromarray(rgba, mode="RGBA")
