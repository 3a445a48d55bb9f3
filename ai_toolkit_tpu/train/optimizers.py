"""Optimizer factory + 8-bit quantized-state AdamW.

Covers the reference's optimizer zoo (``/root/reference/toolkit/optimizer.py``:
adamw/adam/lion(+8bit), adafactor, prodigy, dadaptation, ademamix, automagic).
The bitsandbytes 8-bit CUDA optimizers are replaced by a pure-JAX blockwise
int8 moment quantization (same idea as the reference's own ``Auto8bitTensor``,
``/root/reference/toolkit/optimizers/optimizer_utils.py``) which XLA fuses into
the update — no custom kernel needed for speed-of-light here since the op is
bandwidth-bound either way and the int8 state halves the HBM traffic.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


class _Q8(NamedTuple):
    q: jax.Array  # int8 flat [padded]
    scale: jax.Array  # f32 [padded // BLOCK]


def _quantize_blockwise(x: jax.Array) -> _Q8:
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = _pad_len(n) - n
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    safe = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127).astype(jnp.int8)
    return _Q8(q.reshape(-1), scale)


def _dequantize_blockwise(q8: _Q8, shape: tuple[int, ...]) -> jax.Array:
    blocks = q8.q.reshape(-1, BLOCK).astype(jnp.float32) * q8.scale[:, None]
    flat = blocks.reshape(-1)
    n = math.prod(shape) if shape else 1
    return flat[:n].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: Any  # pytree of _Q8
    nu: Any  # pytree of _Q8


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam with both moments stored as blockwise-int8 (+f32 block scales)."""

    def init_fn(params):
        mu = jax.tree.map(lambda p: _quantize_blockwise(jnp.zeros_like(p, jnp.float32)), params)
        nu = jax.tree.map(lambda p: _quantize_blockwise(jnp.zeros_like(p, jnp.float32)), params)
        return ScaleByAdam8bitState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        is_q8 = lambda x: isinstance(x, _Q8)

        def upd(g, mu_q, nu_q):
            g = g.astype(jnp.float32)
            mu = _dequantize_blockwise(mu_q, g.shape) * b1 + g * (1 - b1)
            nu = _dequantize_blockwise(nu_q, g.shape) * b2 + g * g * (1 - b2)
            mu_hat = mu / (1 - b1**count)
            nu_hat = nu / (1 - b2**count)
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            return step, _quantize_blockwise(mu), _quantize_blockwise(nu)

        flat = jax.tree.map(
            upd, updates, state.mu, state.nu, is_leaf=lambda x: is_q8(x)
        )
        # tree_map with multi-output: unzip
        steps = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3)
        mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3)
        nu = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3)
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def get_optimizer(
    name: str,
    learning_rate: float | optax.Schedule,
    params: dict[str, Any] | None = None,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """Map reference optimizer names to optax transforms (+grad clipping)."""
    name = (name or "adamw").lower()
    p = dict(params or {})
    wd = p.pop("weight_decay", 1e-2)
    betas = p.pop("betas", (0.9, 0.999))
    eps = p.pop("eps", 1e-8)

    if name in ("adamw", "adamw_fused"):
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
    elif name == "adam":
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    elif name in ("adamw8bit", "adam8bit", "adamw8", "adam8"):
        tx = adamw8bit(learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
    elif name in ("lion", "lion8bit"):
        tx = optax.lion(learning_rate, weight_decay=wd)
    elif name == "adagrad":
        tx = optax.adagrad(learning_rate)
    elif name == "adafactor":
        tx = optax.adafactor(learning_rate)
    elif name in ("prodigy", "prodigy8bit"):
        tx = optax.contrib.prodigy(learning_rate, weight_decay=wd)
    elif name.startswith("dadapt"):
        tx = optax.contrib.dadapt_adamw(learning_rate, weight_decay=wd)
    elif name in ("ademamix", "ademamix8bit"):
        tx = optax.contrib.ademamix(learning_rate, weight_decay=wd)
    elif name == "muon":
        tx = optax.contrib.muon(learning_rate)
    elif name.startswith("automagic"):
        from ai_toolkit_tpu.train.automagic import automagic

        tx = automagic(lr_bump=p.pop("lr_bump", 3e-6), min_lr=p.pop("min_lr", 1e-7),
                       max_lr=p.pop("max_lr", 1e-3), starting_lr=learning_rate
                       if isinstance(learning_rate, float) else 1e-5,
                       packed_lr_mask=bool(p.pop("packed_lr_mask", True)),
                       paramiter_swapping=float(p.pop("paramiter_swapping", 0.0)))
    elif name == "sgd":
        tx = optax.sgd(learning_rate, momentum=p.pop("momentum", 0.9))
    else:
        raise ValueError(f"unknown optimizer '{name}'")

    if max_grad_norm and max_grad_norm > 0:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
