"""Automagic optimizer — JAX port of the reference's custom optimizer.

Semantics from ``/root/reference/toolkit/optimizers/automagic.py``: an
adafactor-style factored second moment with RMS update clipping, plus a
*per-element learning-rate mask* that is bumped up when the update sign agrees
with the previous step and bumped down when it flips, clamped to
[min_lr, max_lr]. The polarity bit and lr mask are the optimizer state.

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
    lr_mask: Any  # f32 pytree of per-element lrs


def _rms(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.mean(jnp.square(x)) + 1e-30)


def automagic(
    lr_bump: float = 3e-6,
    min_lr: float = 1e-7,
    max_lr: float = 1e-3,
    starting_lr: float = 1e-5,
    beta2: float = 0.999,
    eps: float = 1e-30,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def factored(shape) -> bool:
        return len(shape) >= 2

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
            lr_mask=jax.tree.map(lambda p: jnp.full(p.shape, starting_lr, jnp.float32), params),
        )

    def update_fn(updates, state, params=None):
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

            cur_pol = update > 0
            agree = cur_pol == pol
            new_lr = jnp.clip(jnp.where(agree, lrm + lr_bump, lrm - lr_bump), min_lr, max_lr)
            step = update * new_lr
            if weight_decay and params is not None:
                step = step + p.astype(jnp.float32) * weight_decay * new_lr
            # optax convention: returned updates are *added* to params
            return -step, new_sq, cur_pol, new_lr

        p_tree = params if params is not None else updates
        out = jax.tree.map(
            upd, updates, state.exp_avg_sq, state.last_polarity, state.lr_mask, p_tree,
            is_leaf=lambda x: isinstance(x, dict) and set(x.keys()) == {"row", "col"},
        )
        is4 = lambda x: isinstance(x, tuple) and len(x) == 4
        steps = jax.tree.map(lambda t: t[0], out, is_leaf=is4)
        sq = jax.tree.map(lambda t: t[1], out, is_leaf=is4)
        pol = jax.tree.map(lambda t: t[2], out, is_leaf=is4)
        lrm = jax.tree.map(lambda t: t[3], out, is_leaf=is4)
        return steps, AutomagicState(
            count=state.count + 1, exp_avg_sq=sq, last_polarity=pol, lr_mask=lrm
        )

    return optax.GradientTransformation(init_fn, update_fn)
