"""Pallas TPU grouped-GEMM MoE dispatch (gather → grouped SwiGLU → combine).

TPU-native replacement for the reference's per-expert loop dispatch
(``extensions_built_in/diffusion_models/hidream/src/models/moe.py:79-103``,
which indexes tokens per expert with boolean masks on GPU). Here:

1. tokens are flattened to (token, k) dispatch entries, sorted by expert id,
   and scattered into a block-aligned buffer (every ``block_m`` row-tile
   belongs to exactly one expert — padding rows are zero and contribute
   nothing in fwd or bwd);
2. one Pallas grouped-GEMM kernel runs the full SwiGLU FFN per row-tile,
   reading that tile's expert weights via a scalar-prefetched ``tile_group``
   map (megablocks-style ragged GEMM — no capacity drops, exact top-k math);
3. outputs are gathered back per entry and combined with the gate weights.

Cost: top_k× FFN FLOPs (+ ≤ E·block_m padding rows) instead of the dense
fallback's num_experts× (``flux_dit.MoEFFN`` dense path) — 2× fewer MoE FFN
FLOPs for hidream's E=4/k=2.

The grouped GEMM is a ``jax.custom_vjp``: backward runs two more grouped
kernels (dx with per-tile recompute; dw with expert-run output revisiting —
sorted order makes each expert's tiles contiguous, so the out-block revisit
pattern is legal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, prefs: tuple[int, ...]) -> int:
    for c in prefs:
        if dim % c == 0 and dim >= c:
            return c
    return dim


_VMEM_BUDGET = 15 * 1024 * 1024  # ~16MB/core physical, leave headroom


def _bh_candidates(h: int) -> list[int]:
    """Legal hidden-tile sizes: 128-multiples dividing h, or h itself
    (Mosaic: a block's last dim must be a lane multiple or the full dim)."""
    cands = [c for c in (512, 384, 256, 128) if h % c == 0]
    return cands or [h]


def default_blocks(d: int, h: int, n_rows: int, itemsize: int = 2) -> tuple[int, int]:
    """(block_m, block_h) for the fwd/dx kernels (double-buffered pipeline:
    3 weight in-blocks [d, bh], x/dy/out row tiles, one f32 accumulator).
    The dw kernel picks its own hidden tile via ``_dw_block_h``."""

    bh_min = _bh_candidates(h)[-1]

    def fits(bm: int, bh: int) -> bool:
        w_in = 2 * 3 * d * bh * itemsize
        fwd = w_in + 2 * 2 * bm * d * itemsize + bm * d * 4  # x + out + acc
        bwd_dx = w_in + 2 * 3 * bm * d * itemsize + bm * d * 4  # x, dy, dx + acc
        # the dw kernel must also fit at this bm for SOME legal hidden tile
        bwd_dw = 6 * d * bh_min * (itemsize + 4) + 2 * 2 * bm * d * itemsize
        return max(fwd, bwd_dx, bwd_dw) <= _VMEM_BUDGET

    bm_cands = [c for c in (512, 256, 128, 64, 32, 16, 8) if c <= max(n_rows, 8)] or [8]
    bh_cands = _bh_candidates(h)
    pairs = sorted(
        ((bm, bh) for bm in bm_cands for bh in bh_cands),
        key=lambda p: (min(p), p[0] * p[1]),
        reverse=True,
    )
    for bm, bh in pairs:
        if fits(bm, bh):
            return bm, bh
    return bm_cands[-1], bh_cands[-1]


def _dw_block_h(d: int, h: int, bm: int, itemsize: int = 2) -> int:
    """Hidden tile for the dw kernel: 3 weight in-blocks + 3 f32 out-blocks
    (both double-buffered) + x/dy row tiles."""
    for bh in _bh_candidates(h):
        used = 2 * 3 * d * bh * itemsize + 2 * 3 * d * bh * 4 + 2 * 2 * bm * d * itemsize
        if used <= _VMEM_BUDGET:
            return bh
    return _bh_candidates(h)[-1]


def _silu_and_grad(h1):
    sg = jax.nn.sigmoid(h1)
    a = h1 * sg  # silu
    da = sg * (1.0 + h1 * (1.0 - sg))  # d silu / d h1
    return a, da


def _fwd_kernel(gid_ref, x_ref, w1_ref, w3_ref, w2_ref, o_ref, acc, *, nh):
    j = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)  # [bm, d]
    w1 = w1_ref[0].astype(jnp.float32)  # [d, bh]
    w3 = w3_ref[0].astype(jnp.float32)
    w2 = w2_ref[0].astype(jnp.float32)  # [bh, d]
    h1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h3 = jnp.dot(x, w3, preferred_element_type=jnp.float32)
    a, _ = _silu_and_grad(h1)
    part = jnp.dot(a * h3, w2, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += part

    @pl.when(j == nh - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _dx_kernel(gid_ref, x_ref, dy_ref, w1_ref, w3_ref, w2_ref, dx_ref, acc, *, nh):
    j = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    w1 = w1_ref[0].astype(jnp.float32)
    w3 = w3_ref[0].astype(jnp.float32)
    w2 = w2_ref[0].astype(jnp.float32)
    h1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h3 = jnp.dot(x, w3, preferred_element_type=jnp.float32)
    a, da = _silu_and_grad(h1)
    dp = jnp.dot(dy, w2.T, preferred_element_type=jnp.float32)  # [bm, bh]
    dh1 = dp * h3 * da
    dh3 = dp * a
    part = jnp.dot(dh1, w1.T, preferred_element_type=jnp.float32) + jnp.dot(
        dh3, w3.T, preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += part

    @pl.when(j == nh - 1)
    def _():
        dx_ref[...] = acc[...].astype(dx_ref.dtype)


def _dw_kernel(gid_ref, x_ref, dy_ref, w1_ref, w3_ref, w2_ref, dw1_ref, dw3_ref, dw2_ref):
    """Grid (H, M) — m innermost so each expert's out-block revisit run is
    contiguous (tiles are expert-sorted)."""
    i = pl.program_id(1)
    gid = gid_ref[i]
    prev = gid_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (prev != gid)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    w1 = w1_ref[0].astype(jnp.float32)
    w3 = w3_ref[0].astype(jnp.float32)
    w2 = w2_ref[0].astype(jnp.float32)
    h1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h3 = jnp.dot(x, w3, preferred_element_type=jnp.float32)
    a, da = _silu_and_grad(h1)
    dp = jnp.dot(dy, w2.T, preferred_element_type=jnp.float32)
    dh1 = dp * h3 * da
    dh3 = dp * a

    @pl.when(first)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    dw1_ref[0] += jnp.dot(x.T, dh1, preferred_element_type=jnp.float32)
    dw3_ref[0] += jnp.dot(x.T, dh3, preferred_element_type=jnp.float32)
    dw2_ref[0] += jnp.dot((a * h3).T, dy, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def grouped_swiglu(x, w1, w3, w2, tile_group, block_m, block_h):
    """Row-grouped SwiGLU FFN: ``y[i*bm:(i+1)*bm] = swiglu(x_tile, W[g_i])``.

    x: [N, d] expert-sorted, N % block_m == 0; w1/w3: [E, d, h]; w2: [E, h, d];
    tile_group: [N // block_m] int32 expert id per row-tile.
    """
    y, _ = _gs_fwd(x, w1, w3, w2, tile_group, block_m, block_h)
    return y


def _gs_fwd(x, w1, w3, w2, tile_group, block_m, block_h):
    n, d = x.shape
    e, _, h = w1.shape
    nm, nh = n // block_m, h // block_h
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, nh),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j, g: (i, 0)),
            pl.BlockSpec((1, d, block_h), lambda i, j, g: (g[i], 0, j)),
            pl.BlockSpec((1, d, block_h), lambda i, j, g: (g[i], 0, j)),
            pl.BlockSpec((1, block_h, d), lambda i, j, g: (g[i], j, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j, g: (i, 0)),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, nh=nh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
    )(tile_group, x, w1, w3, w2)
    return y, (x, w1, w3, w2, tile_group)


def _gs_bwd(block_m, block_h, res, dy):
    x, w1, w3, w2, tile_group = res
    n, d = x.shape
    e, _, h = w1.shape
    nm, nh = n // block_m, h // block_h

    dx_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, nh),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j, g: (i, 0)),
            pl.BlockSpec((block_m, d), lambda i, j, g: (i, 0)),
            pl.BlockSpec((1, d, block_h), lambda i, j, g: (g[i], 0, j)),
            pl.BlockSpec((1, d, block_h), lambda i, j, g: (g[i], 0, j)),
            pl.BlockSpec((1, block_h, d), lambda i, j, g: (g[i], j, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j, g: (i, 0)),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
    )
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, nh=nh),
        grid_spec=dx_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
    )(tile_group, x, dy, w1, w3, w2)

    bh_dw = min(_dw_block_h(d, h, block_m), block_h)
    nh_dw = h // bh_dw
    dw_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nh_dw, nm),  # m innermost: contiguous revisit per expert run
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i, g: (i, 0)),
            pl.BlockSpec((block_m, d), lambda j, i, g: (i, 0)),
            pl.BlockSpec((1, d, bh_dw), lambda j, i, g: (g[i], 0, j)),
            pl.BlockSpec((1, d, bh_dw), lambda j, i, g: (g[i], 0, j)),
            pl.BlockSpec((1, bh_dw, d), lambda j, i, g: (g[i], j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, bh_dw), lambda j, i, g: (g[i], 0, j)),
            pl.BlockSpec((1, d, bh_dw), lambda j, i, g: (g[i], 0, j)),
            pl.BlockSpec((1, bh_dw, d), lambda j, i, g: (g[i], j, 0)),
        ],
        scratch_shapes=[],
    )
    dw1, dw3, dw2 = pl.pallas_call(
        _dw_kernel,
        grid_spec=dw_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e, d, h), jnp.float32),
            jax.ShapeDtypeStruct((e, d, h), jnp.float32),
            jax.ShapeDtypeStruct((e, h, d), jnp.float32),
        ],
    )(tile_group, x, dy, w1, w3, w2)
    dtg = np.zeros(tile_group.shape, dtype=jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), dw3.astype(w3.dtype), dw2.astype(w2.dtype), dtg)


grouped_swiglu.defvjp(_gs_fwd, _gs_bwd)


def moe_dispatch_swiglu(x, topv, topi, w1, w3, w2, block_m: int = 0, block_h: int = 0):
    """Full gather-dispatch MoE SwiGLU: x [B,S,d], topv/topi [B,S,K],
    expert banks w1/w3 [E,d,h], w2 [E,h,d] → [B,S,d] gate-combined output."""
    b, s, d = x.shape
    e = w1.shape[0]
    k = topi.shape[-1]
    n = b * s * k
    if not block_m or not block_h:
        bm, bh = default_blocks(d, w1.shape[-1], n)
        block_m = block_m or bm
        block_h = block_h or bh
    xf = x.reshape(b * s, d)
    eid = topi.reshape(n).astype(jnp.int32)
    tok = jnp.repeat(jnp.arange(b * s, dtype=jnp.int32), k)
    order = jnp.argsort(eid, stable=True)
    sorted_eid = eid[order]
    counts = jnp.bincount(eid, length=e)
    padded = ((counts + block_m - 1) // block_m) * block_m
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    group_start = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    rank = jnp.arange(n, dtype=jnp.int32) - group_start[sorted_eid]
    dst_sorted = starts[sorted_eid] + rank  # row in the padded buffer
    npad = -(-(n + e * block_m) // block_m) * block_m  # static upper bound
    x_sorted = jnp.zeros((npad, d), x.dtype).at[dst_sorted].set(xf[tok[order]])
    # expert id per row-tile (tiles past the used region clamp to the last
    # expert; their rows are zero and their outputs are never gathered)
    tile_edges = jnp.cumsum(padded)
    tile_group = jnp.searchsorted(
        tile_edges, jnp.arange(npad // block_m, dtype=jnp.int32) * block_m, side="right"
    ).astype(jnp.int32)
    tile_group = jnp.minimum(tile_group, e - 1)

    y_sorted = grouped_swiglu(x_sorted, w1, w3, w2, tile_group, block_m, block_h)

    dst = jnp.zeros((n,), jnp.int32).at[order].set(dst_sorted)  # per-entry row
    y_entries = y_sorted[dst].reshape(b, s, k, d)
    return jnp.einsum("bskd,bsk->bsd", y_entries.astype(jnp.float32),
                      topv.astype(jnp.float32)).astype(x.dtype)
