"""Rotary position embeddings: 1D (text) and multi-axis (FLUX-style image/video).

FLUX-class DiTs rotate each head dim segment by a different positional axis
(text-id, image-y, image-x); Wan-class video adds a frame axis. We precompute
cos/sin tables host-side per resolution bucket so the jitted step sees static
shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_frequencies(pos: jax.Array, dim: int, theta: float = 10_000.0) -> jax.Array:
    """Complex-as-pairs rope table for integer/real positions.

    pos: [..., N] positions; returns [..., N, dim/2, 2, 2] rotation matrices
    packed as cos/sin pairs (same layout as the common flux implementations).
    """
    assert dim % 2 == 0
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)  # [dim/2]
    out = jnp.einsum("...n,d->...nd", pos.astype(jnp.float32), omega)
    cos, sin = jnp.cos(out), jnp.sin(out)
    # rotation matrix [[cos, -sin], [sin, cos]]
    table = jnp.stack([cos, -sin, sin, cos], axis=-1)
    return table.reshape(out.shape + (2, 2))


def multi_axis_rope(ids: jax.Array, axes_dim: list[int], theta: float = 10_000.0) -> jax.Array:
    """Concatenate per-axis rope tables.

    ids: [..., N, n_axes] integer coordinates; axes_dim: head-dim split per axis
    (sum == head_dim). Returns [..., N, head_dim/2, 2, 2].
    """
    tables = [
        rope_frequencies(ids[..., i], axes_dim[i], theta) for i in range(len(axes_dim))
    ]
    return jnp.concatenate(tables, axis=-3)


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate [B, S, H, D] by a [B|1, S, D/2, 2, 2] table (head-broadcast)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 1, 2)
    freqs = freqs[..., None, :, :, :] if freqs.ndim == x.ndim + 1 else freqs
    # broadcast table over heads: [B, S, 1, D/2, 2, 2]
    if freqs.ndim == 5:  # [B, S, D/2, 2, 2]
        freqs = freqs[:, :, None]
    out = freqs[..., 0] * xf[..., 0] + freqs[..., 1] * xf[..., 1]
    return out.reshape(x.shape).astype(dtype)


def image_position_ids(h: int, w: int, t: int = 1, text_len: int = 0) -> np.ndarray:
    """FLUX-style (t, y, x) integer ids for text+image token sequence (host-side)."""
    img = np.zeros((t * h * w, 3), dtype=np.int32)
    tt, yy, xx = np.meshgrid(np.arange(t), np.arange(h), np.arange(w), indexing="ij")
    img[:, 0] = tt.reshape(-1)
    img[:, 1] = yy.reshape(-1)
    img[:, 2] = xx.reshape(-1)
    if text_len:
        txt = np.zeros((text_len, 3), dtype=np.int32)
        return np.concatenate([txt, img], axis=0)
    return img
