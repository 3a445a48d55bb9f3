"""Timestep / patch / pooled-condition embeddings shared across models."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Linear


def timestep_embedding(
    t: jax.Array, dim: int, max_period: float = 10_000.0, time_factor: float = 1000.0
) -> jax.Array:
    """Sinusoidal timestep embedding (DDPM convention).

    ``t`` in [0, 1] for flow-matching models is scaled by ``time_factor``.
    """
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = timestep_embedding(t, self.freq_dim).astype(self.dtype)
        emb = Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="in_layer")(emb)
        emb = nn.silu(emb)
        return Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="out_layer")(emb)


class PatchEmbed(nn.Module):
    """Flatten latent patches -> tokens via a single Linear (DiT patchify)."""

    hidden: int
    patch_size: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, C] latent -> [B, (H/p)(W/p), p*p*C] -> [B, N, hidden]
        b, h, w, c = x.shape
        p = self.patch_size
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        return Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(x)


def unpatchify(x: jax.Array, h: int, w: int, patch_size: int, channels: int) -> jax.Array:
    """[B, N, p*p*C] tokens -> [B, H, W, C] latent."""
    b = x.shape[0]
    p = patch_size
    x = x.reshape(b, h // p, w // p, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, channels)
