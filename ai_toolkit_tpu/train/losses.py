"""Loss library.

Covers the reference's ``SDTrainer.calculate_loss`` family
(``/root/reference/extensions_built_in/sd_trainer/SDTrainer.py:490-1019``):
mse / mae / pseudo-huber cores, per-example loss multipliers, masked loss with
mask normalization, inverted-mask prior blending, SNR / bell timestep
weighting applied upstream, all as pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _haar_dwt2(x: jax.Array) -> jax.Array:
    """Single-level 2D Haar transform on [B, H, W, C] -> [B, H/2, W/2, 4C]
    (LL|LH|HL|HH). Odd trailing rows/cols are truncated."""
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    a = x[:, 0::2, 0::2]
    bb = x[:, 0::2, 1::2]
    cc = x[:, 1::2, 0::2]
    dd = x[:, 1::2, 1::2]
    ll = (a + bb + cc + dd) * 0.5
    lh = (a - bb + cc - dd) * 0.5
    hl = (a + bb - cc - dd) * 0.5
    hh = (a - bb - cc + dd) * 0.5
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


def _core(pred: jax.Array, target: jax.Array, loss_type: str, huber_c: float) -> jax.Array:
    if loss_type == "wavelet":
        # reference wavelet_loss (toolkit/util/losses.py): mse over Haar subbands
        pf = _haar_dwt2(pred.astype(jnp.float32))
        tf = _haar_dwt2(target.astype(jnp.float32))
        d = pf - tf
        return d * d
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if loss_type == "mse":
        return d * d
    if loss_type == "mae":
        return jnp.abs(d)
    if loss_type == "pseudo_huber":
        return jnp.sqrt(d * d + huber_c * huber_c) - huber_c
    raise ValueError(f"unknown loss_type {loss_type}")


def compute_loss(
    pred: jax.Array,
    target: jax.Array,
    *,
    loss_type: str = "mse",
    huber_c: float = 0.001,
    timestep_weights: jax.Array | None = None,  # [B]
    loss_multiplier: jax.Array | None = None,  # [B] per-dataset multiplier
    mask: jax.Array | None = None,  # broadcastable to pred, in [0,1]
    mask_min_value: float = 0.0,
    prior_pred: jax.Array | None = None,  # adapter-off prediction for inverted-mask prior
    inverted_mask_prior_multiplier: float = 0.5,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Scalar loss + metrics. All weighting in f32."""
    elem = _core(pred, target, loss_type, huber_c)  # [B, ...]
    b = elem.shape[0]
    aux: dict[str, jax.Array] = {}

    if mask is not None:
        mask = jnp.clip(mask.astype(jnp.float32), mask_min_value, 1.0)
        if mask.ndim >= 3 and elem.ndim >= 3 and mask.shape[1] != elem.shape[1]:
            # wavelet loss halves spatial dims — pool the mask to match
            f = mask.shape[1] // elem.shape[1]
            mask = mask[:, : elem.shape[1] * f, : elem.shape[2] * f]
            mask = mask.reshape(
                mask.shape[0], elem.shape[1], f, elem.shape[2], f, -1
            ).mean(axis=(2, 4))
        masked = elem * mask
        # normalize by mask coverage so sparse masks don't shrink the loss
        denom = jnp.mean(mask, axis=tuple(range(1, mask.ndim)))  # [B]
        per_ex = jnp.mean(masked, axis=tuple(range(1, elem.ndim))) / jnp.maximum(denom, 1e-4)
        if prior_pred is not None and inverted_mask_prior_multiplier > 0:
            # outside the mask, regress toward the adapter-off prior (preserves background)
            prior_elem = _core(pred, jax.lax.stop_gradient(prior_pred), loss_type, huber_c)
            inv = (1.0 - mask) * prior_elem
            inv_per_ex = jnp.mean(inv, axis=tuple(range(1, elem.ndim)))
            per_ex = per_ex + inverted_mask_prior_multiplier * inv_per_ex
            aux["prior_loss"] = jnp.mean(inv_per_ex)
    else:
        per_ex = jnp.mean(elem, axis=tuple(range(1, elem.ndim)))  # [B]

    if timestep_weights is not None:
        per_ex = per_ex * timestep_weights.astype(jnp.float32)
    if loss_multiplier is not None:
        per_ex = per_ex * loss_multiplier.astype(jnp.float32)

    loss = jnp.mean(per_ex)
    aux["loss_raw"] = jnp.mean(jnp.mean(elem, axis=tuple(range(1, elem.ndim))))
    return loss, aux


def diff_output_preservation_loss(
    pred_class: jax.Array, prior_pred_class: jax.Array, multiplier: float = 1.0
) -> jax.Array:
    """DOP: keep the class-prompt output close to the adapter-off prior
    (reference ``get_prior_prediction`` path, SDTrainer.py:1177)."""
    d = pred_class.astype(jnp.float32) - jax.lax.stop_gradient(prior_pred_class).astype(jnp.float32)
    return jnp.mean(d * d) * multiplier
