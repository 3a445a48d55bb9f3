"""Attention dispatch: XLA fused attention now, Pallas flash attention hook.

Replaces the reference's attention-backend switch
(``/root/reference/jobs/process/BaseSDTrainProcess.py:1812-1836``,
xformers/SDPA/flash) with a single entry point. On TPU the default is
``jax.nn.dot_product_attention`` (XLA emits a fused kernel); the Pallas splash
kernel in ``ops/pallas/flash_attention.py`` is selected for long sequences
where it wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, T, H, D]
    v: jax.Array,  # [B, T, H, D]
    mask: jax.Array | None = None,  # [B, 1|H, S, T] boolean
    is_causal: bool = False,
    implementation: str = "auto",
    scale: float | None = None,
) -> jax.Array:
    """Multi-head attention over [batch, seq, heads, head_dim] tensors."""
    if implementation in ("auto", "xla"):
        return jax.nn.dot_product_attention(
            q, k, v, mask=mask, is_causal=is_causal, scale=scale, implementation="xla"
        )
    if implementation == "pallas":
        from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, is_causal=is_causal, scale=scale)
    if implementation == "reference":
        return _reference_attention(q, k, v, mask=mask, is_causal=is_causal, scale=scale)
    raise ValueError(f"unknown attention implementation: {implementation}")


def _reference_attention(q, k, v, mask=None, is_causal=False, scale=None):
    """Plain einsum attention in f32 — numerics oracle for tests."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    logits = jnp.einsum("bshd,bthd->bhst", qf, kf) * scale
    if is_causal:
        s, t = logits.shape[-2:]
        causal = jnp.tril(jnp.ones((s, t), dtype=bool))
        logits = jnp.where(causal, logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", weights, vf)
    return out.astype(q.dtype)
