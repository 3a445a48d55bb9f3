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
import os

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
    if implementation == "auto":
        # pallas flash kernel when on TPU with block-divisible self-attention
        implementation = (
            "pallas" if _pallas_ok(q, k, mask, is_causal) else "xla"
        )
        if os.environ.get("AIT_ATTN_DEBUG"):
            print(f"[attn] q{tuple(q.shape)} k{tuple(k.shape)} -> {implementation}")
    if implementation == "xla":
        return jax.nn.dot_product_attention(
            q, k, v, mask=mask, is_causal=is_causal, scale=scale, implementation="xla"
        )
    if implementation == "pallas":
        from ai_toolkit_tpu.ops.pallas.flash_attention import (
            flash_attention,
            flash_attention_any,
            flash_attention_streamed,
        )

        s, t = q.shape[1], k.shape[1]
        bq = _best_block(s)
        bk = _best_block(t)
        if not _lane_ok(s, t):
            # non-lane-divisible video buckets (e.g. wan 81f@480x832 = 32760
            # tokens): pad + in-kernel KV mask
            return flash_attention_any(q, k, v, scale)
        if max(s, t) > _RESIDENT_MAX_SEQ:
            # long sequences (video): the resident kernels hold a full-length
            # operand in VMEM per B*H row and OOM past ~8k — stream instead
            return flash_attention_streamed(q, k, v, scale, bq, bk)
        return flash_attention(q, k, v, scale, bq, bk)
    if implementation == "reference":
        return _reference_attention(q, k, v, mask=mask, is_causal=is_causal, scale=scale)
    raise ValueError(f"unknown attention implementation: {implementation}")


# above this, the resident flash kernels' full-length VMEM operand (K/V in
# fwd/dq, Q/dO in dkv) exceeds the 16M scoped budget — streamed variant
# (kept in sync with pallas.flash_attention.RESIDENT_MAX_SEQ, which
# flash_attention_any uses for the same routing after padding)
_RESIDENT_MAX_SEQ = 8192


def _best_block(s: int) -> int:
    for b in (512, 256, 128):
        if s % b == 0:
            return b
    return s  # single block


def _d64_min_seq() -> int:
    """Min sequence length where the half-lane d=64 kernel beats XLA's
    materialized-logits path. 2048 measured safe (r5); AIT_FLASH_D64_MIN_SEQ
    overrides for A/B (SDXL@1024's 1280-dim level sits at s=1024)."""
    import os

    return int(os.environ.get("AIT_FLASH_D64_MIN_SEQ", "2048"))


def _pallas_ok(q, k, mask, is_causal) -> bool:
    if mask is not None or is_causal:
        return False  # kernel currently implements dense bidirectional attention
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    s, t, d = q.shape[1], k.shape[1], q.shape[-1]
    if d % 128 != 0 and not (d == 64 and q.shape[1] >= _d64_min_seq()):
        # d == 64 (SDXL self-attention): legal Mosaic block (last dim equals
        # the array dim) but HALF the MXU lanes idle — only a win where the
        # [S,T] logits XLA materializes dwarf that waste (long sequences)
        return False
    if _lane_ok(s, t):
        return True
    # odd long shapes (video buckets): pad+mask streamed path — only worth
    # it where the XLA fallback's [S, T] logits would be enormous
    return max(s, t) >= 4096


def _lane_ok(s: int, t: int) -> bool:
    """Shapes the resident kernels take directly (no padding)."""
    return (s % 128 == 0 or s < 128) and (t % 128 == 0 or t < 128)


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
