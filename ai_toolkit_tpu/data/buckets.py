"""Aspect-ratio bucketing.

Behavior-compatible with the reference's pixel-budget algorithm
(``/root/reference/toolkit/buckets.py:17-48``): scale the image so its pixel
count hits ``min(native, resolution^2)``, snap each side to the model's
divisibility grid, and pick the candidate whose pixel count is closest to the
target without exceeding the budget. A finite bucket grid = a finite set of
static latent shapes for XLA.
"""

from __future__ import annotations

import math


def get_bucket_for_image_size(
    width: int, height: int, resolution: int = 512, divisibility: int = 8
) -> tuple[int, int]:
    """Returns (bucket_width, bucket_height)."""
    total_pixels = width * height
    max_pixels = resolution * resolution
    target_pixels = min(total_pixels, max_pixels)

    scaler = (target_pixels / total_pixels) ** 0.5
    w_raw = (width * scaler) / divisibility
    h_raw = (height * scaler) / divisibility

    candidates = [
        (math.floor(w_raw) * divisibility, math.floor(h_raw) * divisibility),
        (math.floor(w_raw) * divisibility, math.ceil(h_raw) * divisibility),
        (math.ceil(w_raw) * divisibility, math.floor(h_raw) * divisibility),
        (math.ceil(w_raw) * divisibility, math.ceil(h_raw) * divisibility),
    ]
    capped = [(w, h) for w, h in candidates if w > 0 and h > 0 and w * h <= max_pixels]
    if not capped:
        capped = [
            (
                max(divisibility, math.floor(w_raw) * divisibility),
                max(divisibility, math.floor(h_raw) * divisibility),
            )
        ]
    return min(capped, key=lambda wh: abs(wh[0] * wh[1] - target_pixels))


def resize_and_crop_size(
    src_w: int, src_h: int, bucket_w: int, bucket_h: int
) -> tuple[int, int, int, int]:
    """Cover-resize dims + centered crop offsets: (resize_w, resize_h, x0, y0)."""
    scale = max(bucket_w / src_w, bucket_h / src_h)
    rw, rh = max(bucket_w, math.ceil(src_w * scale)), max(bucket_h, math.ceil(src_h * scale))
    x0 = (rw - bucket_w) // 2
    y0 = (rh - bucket_h) // 2
    return rw, rh, x0, y0
