"""Host-side image augmentations with spatial replay.

The reference exposes the whole albumentations registry via config dicts
(``/root/reference/toolkit/dataloader_mixins.py:1380-1470``: ``Augments``
specs -> ``A.ReplayCompose``, with spatial transforms replayed onto control
images and masks). albumentations isn't in this image, so this module
implements the commonly used subset natively on numpy/cv2 with the same
config surface:

    augmentations:
      - method: HorizontalFlip
        params: {p: 0.5}
      - method: ColorJitter
        params: {brightness: 0.2, contrast: 0.2, saturation: 0.2, hue: 0.03}

Unknown method names raise (mirroring the reference's ``assert hasattr(A,
name)``) — nothing silently no-ops. Every op is size-preserving on the
bucket-shaped image (the pipeline runs after bucket resize+crop, so batch
shapes stay static for jit). Spatial ops record replay parameters; the same
geometry is re-applied to control images and masks via ``replay()``.

All ops take/return float32 HWC arrays in [-1, 1].
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# ops whose geometry must be replayed onto control images / masks (matches the
# reference's spatial_transforms list, dataloader_mixins.py:1432)
SPATIAL_OPS = {
    "HorizontalFlip", "VerticalFlip", "Flip", "Rotate", "RandomRotate90",
    "Resize", "GridDistortion", "OpticalDistortion",
}


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)


def _from_u8(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 127.5 - 1.0


def _rotate(img: np.ndarray, angle: float, is_mask: bool) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    out = cv2.warpAffine(img, m, (w, h), flags=interp, borderMode=cv2.BORDER_REFLECT_101)
    return out.reshape(img.shape)


def _grid_distort(img: np.ndarray, steps: int, xsteps: list, ysteps: list, is_mask: bool) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    # piecewise-linear remap per grid cell (albumentations GridDistortion)
    xx = np.zeros(w, np.float32)
    prev, idx = 0.0, 0
    for i in range(steps + 1):
        start = int(w / steps * i)
        end = min(int(w / steps * (i + 1)), w)
        cur = prev + (w / steps) * xsteps[i]
        xx[start:end] = np.linspace(prev, cur, end - start, endpoint=False)
        prev = cur
        idx = end
    xx[idx:] = prev
    yy = np.zeros(h, np.float32)
    prev = 0.0
    for i in range(steps + 1):
        start = int(h / steps * i)
        end = min(int(h / steps * (i + 1)), h)
        cur = prev + (h / steps) * ysteps[i]
        yy[start:end] = np.linspace(prev, cur, end - start, endpoint=False)
        prev = cur
        idx = end
    yy[idx:] = prev
    map_x = np.tile(xx, (h, 1))
    map_y = np.tile(yy[:, None], (1, w))
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    out = cv2.remap(img, map_x, map_y, interp, borderMode=cv2.BORDER_REFLECT_101)
    return out.reshape(img.shape)


def _optical_distort(img: np.ndarray, k: float, is_mask: bool) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    fx = fy = max(h, w)
    cam = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
    dist = np.array([k, k, 0, 0, 0], np.float32)
    map_x, map_y = cv2.initUndistortRectifyMap(cam, dist, None, cam, (w, h), cv2.CV_32FC1)
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    out = cv2.remap(img, map_x, map_y, interp, borderMode=cv2.BORDER_REFLECT_101)
    return out.reshape(img.shape)


def _apply_spatial(img: np.ndarray, name: str, p: dict, is_mask: bool) -> np.ndarray:
    """Deterministic geometry application given sampled params — the replay
    primitive shared by the main image and control/mask replays."""
    import cv2

    if name in ("HorizontalFlip",) or (name == "Flip" and p["d"] in (1, -1)):
        img = img[:, ::-1]
    if name in ("VerticalFlip",) or (name == "Flip" and p["d"] in (0, -1)):
        img = img[::-1]
    if name == "Rotate":
        img = _rotate(img, p["angle"], is_mask)
    if name == "RandomRotate90":
        img = np.rot90(img, k=p["k"], axes=(0, 1))
    if name == "Resize":
        interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
        out = cv2.resize(img, (p["width"], p["height"]), interpolation=interp)
        img = out.reshape((p["height"], p["width"]) + img.shape[2:])
    if name == "GridDistortion":
        img = _grid_distort(img, p["steps"], p["xsteps"], p["ysteps"], is_mask)
    if name == "OpticalDistortion":
        img = _optical_distort(img, p["k"], is_mask)
    return np.ascontiguousarray(img)


@dataclass
class AugmentOp:
    method: str
    params: dict[str, Any] = field(default_factory=dict)

    @property
    def p(self) -> float:
        # albumentations defaults: geometric/photometric ops fire at p=0.5
        # unless the config says otherwise; Resize is always-on
        default = 1.0 if self.method == "Resize" else 0.5
        return float(self.params.get("p", default))

    def sample(self, rng: random.Random, img: np.ndarray) -> dict | None:
        """Roll the dice; return the sampled op params (or None = skipped)."""
        if rng.random() >= self.p:
            return None
        m, prm = self.method, self.params

        def lim(key, default):
            v = prm.get(key, default)
            return (-abs(v), abs(v)) if isinstance(v, (int, float)) else tuple(v)

        s: dict[str, Any] = {}
        if m == "Flip":
            s["d"] = rng.choice([-1, 0, 1])
        elif m == "Rotate":
            lo, hi = lim("limit", 90)
            s["angle"] = rng.uniform(lo, hi)
        elif m == "RandomRotate90":
            s["k"] = rng.randint(0, 3)
        elif m == "Resize":
            s["height"] = int(prm.get("height", img.shape[0]))
            s["width"] = int(prm.get("width", img.shape[1]))
        elif m == "GridDistortion":
            steps = int(prm.get("num_steps", 5))
            lo, hi = lim("distort_limit", 0.3)
            s["steps"] = steps
            s["xsteps"] = [1.0 + rng.uniform(lo, hi) for _ in range(steps + 1)]
            s["ysteps"] = [1.0 + rng.uniform(lo, hi) for _ in range(steps + 1)]
        elif m == "OpticalDistortion":
            lo, hi = lim("distort_limit", 0.05)
            s["k"] = rng.uniform(lo, hi)
        elif m == "ColorJitter":
            for k, d in (("brightness", 0.2), ("contrast", 0.2), ("saturation", 0.2)):
                v = float(prm.get(k, d))
                s[k] = rng.uniform(max(0.0, 1 - v), 1 + v)
            hv = float(prm.get("hue", 0.03))
            s["hue"] = rng.uniform(-hv, hv)
        elif m == "RandomBrightnessContrast":
            lo, hi = lim("brightness_limit", 0.2)
            s["brightness"] = rng.uniform(lo, hi)
            lo, hi = lim("contrast_limit", 0.2)
            s["contrast"] = rng.uniform(lo, hi)
        elif m == "HueSaturationValue":
            lo, hi = lim("hue_shift_limit", 20)
            s["hue"] = rng.uniform(lo, hi)
            lo, hi = lim("sat_shift_limit", 30)
            s["sat"] = rng.uniform(lo, hi)
            lo, hi = lim("val_shift_limit", 20)
            s["val"] = rng.uniform(lo, hi)
        elif m == "RandomGamma":
            lo, hi = tuple(prm.get("gamma_limit", (80, 120)))
            s["gamma"] = rng.uniform(lo, hi) / 100.0
        elif m == "GaussNoise":
            lo, hi = tuple(prm.get("var_limit", (10.0, 50.0)))
            s["sigma"] = np.sqrt(rng.uniform(lo, hi))
            s["seed"] = rng.randrange(1 << 31)
        elif m in ("GaussianBlur", "Blur", "MotionBlur"):
            bl = prm.get("blur_limit", 7)
            lo, hi = (3, bl) if isinstance(bl, (int, float)) else tuple(bl)
            k = rng.randrange(int(lo), int(hi) + 1)
            s["ksize"] = k + (1 - k % 2)  # odd
            if m == "MotionBlur":
                s["angle"] = rng.uniform(0, 180)
        elif m == "Solarize":
            s["threshold"] = float(prm.get("threshold", 128))
        elif m == "Posterize":
            nb = prm.get("num_bits", 4)
            s["bits"] = rng.randint(*nb) if isinstance(nb, (list, tuple)) else int(nb)
        elif m == "Downscale":
            lo = float(prm.get("scale_min", 0.25))
            hi = float(prm.get("scale_max", 0.5))
            s["scale"] = rng.uniform(lo, hi)
        elif m == "ImageCompression":
            lo = int(prm.get("quality_lower", 40))
            hi = int(prm.get("quality_upper", 90))
            s["quality"] = rng.randint(lo, hi)
        elif m == "Sharpen":
            lo, hi = tuple(prm.get("alpha", (0.2, 0.5)))
            s["alpha"] = rng.uniform(lo, hi)
            lo, hi = tuple(prm.get("lightness", (0.5, 1.0)))
            s["lightness"] = rng.uniform(lo, hi)
        elif m == "CLAHE":
            cl = prm.get("clip_limit", 4.0)
            lo, hi = (1.0, cl) if isinstance(cl, (int, float)) else tuple(cl)
            s["clip"] = rng.uniform(lo, hi)
        elif m in ("HorizontalFlip", "VerticalFlip", "ToGray", "ChannelShuffle",
                   "InvertImg", "Equalize"):
            if m == "ChannelShuffle":
                order = [0, 1, 2]
                rng.shuffle(order)
                s["order"] = order
        else:
            raise ValueError(
                f"unsupported augmentation method: {m!r} (supported: "
                f"{sorted(_PHOTOMETRIC | SPATIAL_OPS)})"
            )
        return s

    def apply(self, img: np.ndarray, s: dict) -> np.ndarray:
        import cv2

        m = self.method
        if m in SPATIAL_OPS:
            return _apply_spatial(img, m, s, is_mask=False)
        if m == "ColorJitter":
            u8 = _to_u8(img)
            hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] + s["hue"] * 180.0) % 180.0
            hsv[..., 1] = np.clip(hsv[..., 1] * s["saturation"], 0, 255)
            u8 = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
            f = u8.astype(np.float32) * s["brightness"]
            mean = f.mean()
            f = (f - mean) * s["contrast"] + mean
            return _from_u8(np.clip(f, 0, 255).astype(np.uint8))
        if m == "RandomBrightnessContrast":
            f = (img + 1.0) * 0.5
            f = (f - 0.5) * (1.0 + s["contrast"]) + 0.5 + s["brightness"]
            return np.clip(f, 0, 1) * 2.0 - 1.0
        if m == "HueSaturationValue":
            hsv = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] + s["hue"] / 2.0) % 180.0
            hsv[..., 1] = np.clip(hsv[..., 1] + s["sat"], 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] + s["val"], 0, 255)
            return _from_u8(cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB))
        if m == "RandomGamma":
            f = np.clip((img + 1.0) * 0.5, 0, 1) ** s["gamma"]
            return f * 2.0 - 1.0
        if m == "GaussNoise":
            g = np.random.default_rng(s["seed"]).normal(0, s["sigma"], img.shape)
            return np.clip(img + g.astype(np.float32) / 127.5, -1, 1)
        if m in ("GaussianBlur", "Blur"):
            k = s["ksize"]
            if m == "GaussianBlur":
                out = cv2.GaussianBlur(img, (k, k), 0)
            else:
                out = cv2.blur(img, (k, k))
            return out.reshape(img.shape)
        if m == "MotionBlur":
            k = s["ksize"]
            kern = np.zeros((k, k), np.float32)
            kern[k // 2, :] = 1.0
            kern = _rotate(kern[..., None], s["angle"], False)[..., 0]
            kern /= max(kern.sum(), 1e-6)
            return cv2.filter2D(img, -1, kern).reshape(img.shape)
        if m == "ToGray":
            g = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2GRAY)
            return _from_u8(np.repeat(g[..., None], img.shape[-1], -1))
        if m == "ChannelShuffle":
            return img[..., s["order"]]
        if m == "InvertImg":
            return -img
        if m == "Solarize":
            u8 = _to_u8(img)
            return _from_u8(np.where(u8 >= s["threshold"], 255 - u8, u8))
        if m == "Posterize":
            shift = 8 - s["bits"]
            return _from_u8((_to_u8(img) >> shift) << shift)
        if m == "Equalize":
            u8 = _to_u8(img)
            out = np.stack([cv2.equalizeHist(u8[..., c]) for c in range(u8.shape[-1])], -1)
            return _from_u8(out)
        if m == "Downscale":
            h, w = img.shape[:2]
            sh, sw = max(1, int(h * s["scale"])), max(1, int(w * s["scale"]))
            small = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_NEAREST)
            return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST).reshape(img.shape)
        if m == "ImageCompression":
            ok, enc = cv2.imencode(".jpg", _to_u8(img)[..., ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, s["quality"]])
            dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
            return _from_u8(dec)
        if m == "Sharpen":
            blur = cv2.GaussianBlur(img, (0, 0), 1.0)
            sharp = img + s["lightness"] * (img - blur)
            return np.clip((1 - s["alpha"]) * img + s["alpha"] * sharp, -1, 1)
        if m == "CLAHE":
            lab = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2LAB)
            clahe = cv2.createCLAHE(clipLimit=s["clip"], tileGridSize=(8, 8))
            lab[..., 0] = clahe.apply(lab[..., 0])
            return _from_u8(cv2.cvtColor(lab, cv2.COLOR_LAB2RGB))
        raise ValueError(f"unsupported augmentation method: {m!r}")


_PHOTOMETRIC = {
    "ColorJitter", "RandomBrightnessContrast", "HueSaturationValue",
    "RandomGamma", "GaussNoise", "GaussianBlur", "Blur", "MotionBlur",
    "ToGray", "ChannelShuffle", "InvertImg", "Solarize", "Posterize",
    "Equalize", "Downscale", "ImageCompression", "Sharpen", "CLAHE",
}


class AugmentPipeline:
    """Compose ops from config specs; apply to an image recording a replay
    trace; re-apply the spatial subset to controls/masks."""

    def __init__(self, specs: list[dict], shuffle: bool = False, seed: int = 0):
        self.ops = [AugmentOp(d.get("method"), dict(d.get("params", {}))) for d in specs]
        for op in self.ops:
            if op.method not in _PHOTOMETRIC and op.method not in SPATIAL_OPS:
                raise ValueError(
                    f"unsupported augmentation method: {op.method!r} (supported: "
                    f"{sorted(_PHOTOMETRIC | SPATIAL_OPS)})"
                )
        self.shuffle = shuffle
        self.rng = random.Random(seed)

    def __call__(self, img: np.ndarray) -> tuple[np.ndarray, list[tuple[str, dict]]]:
        """Augment; returns (augmented, replay) where replay holds the spatial
        ops actually applied (reference keeps only spatial transforms for
        control/mask replay)."""
        ops = list(self.ops)
        if self.shuffle:
            self.rng.shuffle(ops)
        replay: list[tuple[str, dict]] = []
        out = img
        h, w = img.shape[:2]
        for op in ops:
            s = op.sample(self.rng, out)
            if s is None:
                continue
            out = op.apply(out, s)
            if op.method in SPATIAL_OPS:
                replay.append((op.method, s))
        if out.shape[:2] != (h, w):
            # keep bucket shapes static for jit: a size-changing op (Resize to
            # another size) is scaled back to the bucket geometry
            import cv2

            out = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR).reshape(img.shape)
        return np.ascontiguousarray(out.astype(np.float32)), replay


def replay_spatial(img: np.ndarray, replay: list[tuple[str, dict]], is_mask: bool = False) -> np.ndarray:
    """Apply a recorded spatial trace to a control image or mask (reference
    augment_spatial_control, dataloader_mixins.py:1451)."""
    h, w = img.shape[:2]
    out = img
    for name, s in replay:
        out = _apply_spatial(out, name, s, is_mask=is_mask)
    if out.shape[:2] != (h, w):
        import cv2

        interp = 0 if is_mask else 1  # NEAREST / LINEAR
        out = cv2.resize(out, (w, h), interpolation=interp).reshape(img.shape)
    return np.ascontiguousarray(out.astype(np.float32))
