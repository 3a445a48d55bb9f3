"""Pallas TPU flash attention (forward + custom-VJP backward).

Replaces the reference's xformers/SDPA backend switch with a TPU kernel:
online-softmax over K/V blocks so the [S, T] logits matrix never materializes
in HBM. Forward saves (out, logsumexp) residuals; backward recomputes block
logits (flash-style) to form dQ/dK/dV.

Layout: [B, S, H, D] (same as ops.attention). Grid: (B*H, S_blocks); K/V are
looped inside the kernel body with fori_loop over T blocks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512

# above this, the resident kernels' full-length VMEM operand (K/V in fwd/dq,
# Q/dO in dkv) exceeds the 16M scoped budget — use the streamed variant
RESIDENT_MAX_SEQ = 8192
NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, d]
    block_q, d = q.shape
    num_kv = kv_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [block_k, d]
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [block_q, block_k]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kv, body, (acc, m_i, l_i))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_i)  # [block_q, 1]


def _flash_fwd(q, k, v, scale, block_q, block_k):
    b, s, h, d = q.shape
    t = k.shape[1]
    # [B, S, H, D] -> [B*H, S, D]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    grid = (b * h, s // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, kv_len=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, 1), jnp.float32),
        ],
    )(qt, kt, vt)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3), (lse[..., 0], qt, kt, vt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Flash attention over [B, S, H, D]; S and T must divide the block sizes
    (pad upstream — bucketed shapes make this free)."""
    out, _ = _fwd(q, k, v, scale, block_q, block_k)
    return out


_BLOCK_PREFS = (768, 512, 1024, 384, 256, 128, 64)


def _pick_block(requested: int, seq: int) -> int:
    """Largest well-performing block that divides the sequence (v5e sweep:
    768 beats 512 by ~5% at S=4608; fall back down the list for odd buckets)."""
    for cand in _BLOCK_PREFS:
        if cand <= seq and seq % cand == 0:
            return cand
    return min(requested, seq)


# Forward-only K-block preferences: the inner K loop holds a [bq, bk] f32
# logits tile; bigger bk cuts the per-block acc-rescale (VPU) work. Measured
# v5e S=4608: bk=1536 beats 768 by ~4.5% on fwd; 2304 exceeds the 16M scoped
# VMEM. The BWD kernels keep the smaller prefs — they hold 3x [bq, bk] f32
# (logits+p+ds) and OOM at large bk.
_FWD_BLOCK_K_PREFS = (1536, 1152, 768, 512, 1024, 384, 256, 128, 64)


def _pick_fwd_block_k(requested: int, seq: int) -> int:
    for cand in _FWD_BLOCK_K_PREFS:
        if cand <= seq and seq % cand == 0:
            return cand
    return min(requested, seq)


def _resolve(scale, d, s, t, block_q, block_k, fwd: bool = False):
    bq = _pick_block(block_q, s) if block_q in (DEFAULT_BLOCK_Q, 0) else min(block_q, s)
    if block_k in (DEFAULT_BLOCK_K, 0):
        bk = _pick_fwd_block_k(block_k, t) if fwd else _pick_block(block_k, t)
    else:
        bk = min(block_k, t)
    return (scale if scale is not None else 1.0 / math.sqrt(d), bq, bk)


def _fwd(q, k, v, scale, block_q, block_k):
    from jax.ad_checkpoint import checkpoint_name

    b, s, h, d = q.shape
    t = k.shape[1]
    scale_, bq, bk = _resolve(scale, d, s, t, block_q, block_k, fwd=True)
    assert s % bq == 0 and t % bk == 0, f"seq lens ({s},{t}) must divide blocks ({bq},{bk})"
    out, (lse, qt, kt, vt) = _flash_fwd(q, k, v, scale_, bq, bk)
    # Name the residuals so a remat policy can keep them: with
    # save_only_these_names('flash_out','flash_lse') (+ dots policy for qkv)
    # the backward pass skips re-running the forward kernel entirely.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, *, scale, block_k, kv_len):
    """Grid (B*H, S/block_q): dq for one q block, looping kv blocks."""
    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]  # [bq, 1]
    bq, d = q.shape
    num_kv = kv_len // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale, block_q, q_len):
    """Grid (B*H, T/block_k): dk/dv for one kv block, looping q blocks."""
    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    num_q = q_len // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        g = g_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk]
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, g, preferred_element_type=jnp.float32)
        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_q, body, (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32))
    )
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, res, g):
    """Pallas backward: dq kernel over q blocks, dkv kernel over kv blocks —
    logits never hit HBM (recomputed per block pair, flash style)."""
    q, k, v, out, lse = res
    b, s, h, d = q.shape
    t = k.shape[1]
    scale_, bq, bk = _resolve(scale, d, s, t, block_q, block_k)

    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    gt = g.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    delta = jnp.sum(
        gt.astype(jnp.float32) * out.transpose(0, 2, 1, 3).reshape(b * h, s, d).astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [B*H, S, 1]
    lse3 = lse[..., None]  # [B*H, S, 1]

    full_q = lambda i, j: (i, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale_, block_k=bk, kv_len=t),
        grid=(b * h, s // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
    )(qt, kt, vt, gt, lse3, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale_, block_q=bq, q_len=s),
        grid=(b * h, t // bk),
        in_specs=[
            pl.BlockSpec((1, s, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), full_q, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), v.dtype),
        ],
    )(qt, kt, vt, gt, lse3, delta)

    dq = dq.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    dk = dk.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    dv = dv.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# KV-streaming variant for LONG sequences (video: wan21 81f @480p = 32k
# tokens). The resident kernels above hold full K/V (fwd, dq) or full Q/dO
# (dkv) in VMEM per B*H row — that caps max(S, T) at ~8k on a 16M-VMEM core
# (the wan 9216-token step VMEM-OOMs the dkv kernel by 1.8M). Here every
# operand streams block-by-block via a third grid axis; online-softmax
# state lives in VMEM scratch that persists across the innermost grid axis
# (the canonical TPU flash schedule — pallas_guide.md grid/scratch rules).
# Extra HBM traffic vs resident: K/V re-stream once per q block — at 32k
# tokens that is ~13 GB/step vs 6.6 TFLOP of attention math, still firmly
# compute-bound on v5e.
# ---------------------------------------------------------------------------

_LANES = 128  # scratch last dim: keep lane-aligned (Mosaic tiling)


def _kv_mask(s, kv_block_idx, kv_valid):
    """NEG_INF the logit columns past ``kv_valid`` (padded KV entries).
    kv_valid is STATIC; padding is < one block so no block is ever fully
    masked (m stays finite)."""
    if kv_valid is None:
        return s
    bk = s.shape[-1]
    col = kv_block_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_valid, s, NEG_INF)


def _fwd_kernel_streamed(q_ref, k_ref, v_ref, o_ref, lse_ref,
                         acc_ref, m_ref, l_ref, *, scale, num_kv, kv_valid):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]
    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
    s = _kv_mask(s, kv_i, kv_valid)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kv_i == num_kv - 1)
    def _emit():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:, :1] + jnp.log(l_ref[:, :1])


def _flash_fwd_streamed(q, k, v, scale, bq, bk, kv_valid=None):
    b, s, h, d = q.shape
    t = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    num_kv = t // bk
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_streamed, scale=scale, num_kv=num_kv,
                          kv_valid=kv_valid),
        grid=(b * h, s // bq, num_kv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kv: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j, kv: (i, kv, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j, kv: (i, kv, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kv: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j, kv: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
    )(qt, kt, vt)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3), (lse[..., 0], qt, kt, vt)


def _bwd_dq_kernel_streamed(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                            dq_ref, acc_ref, *, scale, num_kv, kv_valid):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = _kv_mask(s, kv_i, kv_valid)
    p = jnp.exp(s - lse)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_ref[...] = acc_ref[...] + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(kv_i == num_kv - 1)
    def _emit():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_streamed(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                             dk_ref, dv_ref, dk_acc, dv_acc, *, scale, num_q,
                             kv_valid):
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk]
    s = _kv_mask(s, pl.program_id(1), kv_valid)
    p = jnp.exp(s - lse)
    dv_acc[...] = dv_acc[...] + jnp.dot(p.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_acc[...] = dk_acc[...] + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)

    @pl.when(q_i == num_q - 1)
    def _emit():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_streamed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    kv_valid: int | None = None,
) -> jax.Array:
    """Flash attention with block-streamed K/V AND Q — no full-sequence
    operand ever resides in VMEM, so max(S, T) is unbounded (video).
    ``kv_valid`` (static): number of real KV entries when K/V were padded —
    padded logit columns are NEG_INF'd inside the kernels."""
    out, _ = _fwd_streamed(q, k, v, scale, block_q, block_k, kv_valid)
    return out


def _fwd_streamed(q, k, v, scale, block_q, block_k, kv_valid=None):
    from jax.ad_checkpoint import checkpoint_name

    b, s, h, d = q.shape
    t = k.shape[1]
    scale_, bq, bk = _resolve(scale, d, s, t, block_q, block_k)
    assert s % bq == 0 and t % bk == 0, f"seq lens ({s},{t}) must divide blocks ({bq},{bk})"
    out, (lse, _, _, _) = _flash_fwd_streamed(q, k, v, scale_, bq, bk, kv_valid)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _bwd_streamed(scale, block_q, block_k, kv_valid, res, g):
    q, k, v, out, lse = res
    b, s, h, d = q.shape
    t = k.shape[1]
    scale_, bq, bk = _resolve(scale, d, s, t, block_q, block_k)

    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    gt = g.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    delta = jnp.sum(
        gt.astype(jnp.float32)
        * out.transpose(0, 2, 1, 3).reshape(b * h, s, d).astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    lse3 = lse[..., None]
    num_q, num_kv = s // bq, t // bk

    q_spec = pl.BlockSpec((1, bq, d), lambda i, j, kv: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, d), lambda i, j, kv: (i, kv, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, bq, 1), lambda i, j, kv: (i, j, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_streamed, scale=scale_, num_kv=num_kv,
                          kv_valid=kv_valid),
        grid=(b * h, num_q, num_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, r_spec, r_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(qt, kt, vt, gt, lse3, delta)

    # dkv: kv blocks own the output; q streams on the innermost axis
    qs_spec = pl.BlockSpec((1, bq, d), lambda i, j, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    ko_spec = pl.BlockSpec((1, bk, d), lambda i, j, qi: (i, j, 0), memory_space=pltpu.VMEM)
    rs_spec = pl.BlockSpec((1, bq, 1), lambda i, j, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_streamed, scale=scale_, num_q=num_q,
                          kv_valid=kv_valid),
        grid=(b * h, num_kv, num_q),
        in_specs=[qs_spec, ko_spec, ko_spec, qs_spec, rs_spec, rs_spec],
        out_specs=[ko_spec, ko_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
    )(qt, kt, vt, gt, lse3, delta)

    dq = dq.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    dk = dk.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    dv = dv.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


flash_attention_streamed.defvjp(_fwd_streamed, _bwd_streamed)


def flash_attention_any(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """ARBITRARY sequence lengths: pad S/T up to lane multiples, mask the
    padded KV columns inside the streamed kernels, slice the output.

    Real video buckets land on non-128-divisible token counts (wan21 81f
    @480x832 = 32760 tokens) where the XLA fallback would materialize
    multi-GB logits. Padding lives OUTSIDE the custom VJP, so autodiff
    zero-pads the output cotangent — padded Q rows then contribute exactly
    zero to dK/dV (g, dp, delta all vanish) and padded KV columns are
    masked to p == 0 in every kernel."""
    b, s, h, d = q.shape
    t = k.shape[1]
    sp, tp = -s % 128, -t % 128
    if sp == 0 and tp == 0:
        if max(s, t) <= RESIDENT_MAX_SEQ:
            return flash_attention(q, k, v, scale, block_q, block_k)
        return flash_attention_streamed(q, k, v, scale, block_q, block_k)
    if sp:
        q = jnp.pad(q, ((0, 0), (0, sp), (0, 0), (0, 0)))
    if tp:
        k = jnp.pad(k, ((0, 0), (0, tp), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tp), (0, 0), (0, 0)))
    if tp == 0 and max(s + sp, t) <= RESIDENT_MAX_SEQ:
        # only Q was padded: no KV mask needed, and the padded shape fits the
        # resident kernels (K/V stay VMEM-resident instead of re-streaming
        # from HBM once per q block). Padded Q rows are sliced off below;
        # their output cotangent is zero-padded by the pad VJP, so they
        # contribute exactly zero to dK/dV.
        return flash_attention(q, k, v, scale, block_q, block_k)[:, :s]
    out = flash_attention_streamed(q, k, v, scale, block_q, block_k,
                                   t if tp else None)
    return out[:, :s] if sp else out
