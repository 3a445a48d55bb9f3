"""Automagic optimizer — JAX port of the reference's custom optimizer.

Semantics from ``/root/reference/toolkit/optimizers/automagic.py``: an
adafactor-style factored second moment with RMS update clipping, plus a
*per-element learning-rate mask* that is bumped up when the update sign agrees
with the previous step and bumped down when it flips, clamped to
[min_lr, max_lr]. The polarity bit and lr mask are the optimizer state.

Round-2 fidelity additions:
- the lr mask is stored PACKED as uint8 with a per-row absmax scale
  (reference ``Auto8bitTensor``, automagic.py:55-60) — 4x less state memory,
  same requantization drift characteristics as the reference; pass
  ``packed_lr_mask=False`` for exact f32 masks.
- ``paramiter_swapping(factor)``: only a rotating ``factor`` fraction of each
  tensor receives updates each step (reference do_paramiter_swapping — it
  rotates requires_grad subsets on a step cadence; here an elementwise
  rotating mask inside the fused update).

Implemented as a pure optax transform; the sign/bump logic is elementwise and
fuses into one XLA kernel (the reference needed a Triton variant for this,
``automagicEXPERIMENT.py``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class AutomagicState(NamedTuple):
    count: jax.Array
    exp_avg_sq: Any  # factored {row, col} for >=2D params, full otherwise
    last_polarity: Any  # bool pytree
    lr_mask: Any  # packed {q: uint8, scale} per leaf (or f32 pytree)


def _rms(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.mean(jnp.square(x)) + 1e-30)


def _pack_lr(lr: jax.Array) -> dict:
    """uint8 absmax quantization over the last axis (Auto8bitTensor-style);
    0-d leaves (scalar adapter scales) store exactly as q=255 * scale."""
    if lr.ndim == 0:
        scale = jnp.maximum(lr / 255.0, 1e-12)
    else:
        scale = jnp.maximum(jnp.max(lr, axis=-1, keepdims=True) / 255.0, 1e-12)
    q = jnp.clip(jnp.round(lr / scale), 0, 255).astype(jnp.uint8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def _unpack_lr(packed: dict) -> jax.Array:
    return packed["q"].astype(jnp.float32) * packed["scale"]


def automagic(
    lr_bump: float = 3e-6,
    min_lr: float = 1e-7,
    max_lr: float = 1e-3,
    starting_lr: float = 1e-5,
    beta2: float = 0.999,
    eps: float = 1e-30,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
    packed_lr_mask: bool = True,
    paramiter_swapping: float = 0.0,  # 0 = off; e.g. 0.1 trains 10%/step
) -> optax.GradientTransformation:
    def factored(shape) -> bool:
        return len(shape) >= 2

    def init_lr(p):
        full = jnp.full(p.shape, starting_lr, jnp.float32)
        return _pack_lr(full) if packed_lr_mask else full

    def init_fn(params):
        def init_sq(p):
            if factored(p.shape):
                return {
                    "row": jnp.zeros(p.shape[:-1], jnp.float32),
                    "col": jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                }
            return jnp.zeros(p.shape, jnp.float32)

        return AutomagicState(
            count=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree.map(init_sq, params),
            last_polarity=jax.tree.map(lambda p: jnp.zeros(p.shape, bool), params),
            lr_mask=jax.tree.map(init_lr, params),
        )

    n_groups = max(1, round(1.0 / paramiter_swapping)) if paramiter_swapping else 1

    def update_fn(updates, state, params=None):
        count = state.count

        def upd(g, sq, pol, lrm, p):
            g = g.astype(jnp.float32)
            u2 = g * g + eps
            if factored(g.shape):
                row = sq["row"] * beta2 + jnp.mean(u2, axis=-1) * (1 - beta2)
                col = sq["col"] * beta2 + jnp.mean(u2, axis=-2) * (1 - beta2)
                r = jax.lax.rsqrt(row / jnp.mean(row, axis=-1, keepdims=True) + 1e-30)
                c = jax.lax.rsqrt(col + 1e-30)
                update = g * r[..., None] * c[..., None, :]
                new_sq = {"row": row, "col": col}
            else:
                new_sq = sq * beta2 + u2 * (1 - beta2)
                update = g * jax.lax.rsqrt(new_sq + 1e-30)
            update = update / jnp.maximum(_rms(update) / clip_threshold, 1.0)

            lr_now = _unpack_lr(lrm) if packed_lr_mask else lrm
            cur_pol = update > 0
            agree = cur_pol == pol
            new_lr = jnp.clip(
                jnp.where(agree, lr_now + lr_bump, lr_now - lr_bump), min_lr, max_lr
            )
            step = update * new_lr
            if weight_decay and params is not None:
                step = step + p.astype(jnp.float32) * weight_decay * new_lr
            if n_groups > 1:
                # rotating active subset (reference parameter swapping)
                idx = jnp.arange(step.size, dtype=jnp.int32).reshape(step.shape)
                active = (idx % n_groups) == (count % n_groups)
                step = jnp.where(active, step, 0.0)
                cur_pol = jnp.where(active, cur_pol, pol)
                new_lr = jnp.where(active, new_lr, lr_now)
            new_lrm = _pack_lr(new_lr) if packed_lr_mask else new_lr
            # optax convention: returned updates are *added* to params
            return -step, new_sq, cur_pol, new_lrm

        p_tree = params if params is not None else updates
        is_packed = lambda x: isinstance(x, dict) and (
            set(x.keys()) == {"row", "col"} or set(x.keys()) == {"q", "scale"}
        )
        out = jax.tree.map(
            upd, updates, state.exp_avg_sq, state.last_polarity, state.lr_mask, p_tree,
            is_leaf=is_packed,
        )
        is4 = lambda x: isinstance(x, tuple) and len(x) == 4
        steps = jax.tree.map(lambda t: t[0], out, is_leaf=is4)
        sq = jax.tree.map(lambda t: t[1], out, is_leaf=is4)
        pol = jax.tree.map(lambda t: t[2], out, is_leaf=is4)
        lrm = jax.tree.map(lambda t: t[3], out, is_leaf=is4)
        return steps, AutomagicState(
            count=count + 1, exp_avg_sq=sq, last_polarity=pol, lr_mask=lrm
        )

    return optax.GradientTransformation(init_fn, update_fn)
