"""Slider / guidance training objectives.

Port of the semantics in ``/root/reference/toolkit/guidance.py``:

- ``polarity`` (image-pair slider, get_guided_loss_polarity:405): paired
  (conditional, unconditional) latents; the SAME batch runs with the adapter
  at +w on the positive half and -w on the negative half, regressing each
  half to its own flow target. Per-sample multipliers are pure ``scale_lora``
  here — no mutable network state.
- ``targeted`` concept slider (prompt pairs, get_targeted_guidance_loss:278 /
  TrainSliderProcess): adapter-off prior on the neutral prompt, shifted by the
  CFG difference between positive/negative prompt priors, becomes the target
  for the adapter-on prediction at +/- multiplier.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.adapters.lora import scale_lora
from ai_toolkit_tpu.train.state import TrainState, merge_variables
from ai_toolkit_tpu.train.step import TrainStepConfig, optax_global_norm


def make_polarity_train_step(
    predict_fn: Callable[..., jax.Array],
    schedule: Any,
    cfg: TrainStepConfig,
    network_weight: float = 1.0,
):
    """Image-pair slider: batch must carry 'latents' (positive) and
    'unconditional_latents' (negative) plus shared 'cond'."""

    def loss_fn(trainable, model_variables, batch, rng, seq_len):
        pos = batch["latents"]
        neg = batch["unconditional_latents"]
        b = pos.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        if hasattr(schedule, "euler_step"):  # flow matching
            t = schedule.sample_timesteps(
                rng_t, b, timestep_type=cfg.timestep_type, image_seq_len=seq_len
            )
        else:
            t = schedule.sample_timesteps(rng_t, b)
        noise = jax.random.normal(rng_n, pos.shape, pos.dtype)

        target_pos = schedule.target(pos, noise, t)
        target_neg = schedule.target(neg, noise, t)
        noisy_pos = schedule.add_noise(pos, noise, t)
        noisy_neg = schedule.add_noise(neg, noise, t)

        # concat halves with +w / -w per-sample adapter multipliers
        lats = jnp.concatenate([noisy_pos, noisy_neg], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        mult = jnp.concatenate(
            [jnp.full((b,), network_weight), jnp.full((b,), -network_weight)]
        )
        lora = scale_lora(trainable["lora"], mult)
        variables = merge_variables(model_variables, {**trainable, "lora": lora})
        cond = {k: _double(v) for k, v in batch.get("cond", {}).items()}
        pred = predict_fn(variables, lats, tt, cond)
        pred_pos, pred_neg = jnp.split(pred, 2, axis=0)

        loss = jnp.mean(jnp.square(pred_pos.astype(jnp.float32) - target_pos.astype(jnp.float32)))
        loss = loss + jnp.mean(
            jnp.square(pred_neg.astype(jnp.float32) - target_neg.astype(jnp.float32))
        )
        return loss, {}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array, image_seq_len=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = grad_fn(state.trainable, state.model_variables, batch, rng, image_seq_len)
        new_state = state.apply_gradients(grads, ema_decay=cfg.ema_decay)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return train_step


def concept_slider_loss(
    predict_fn,
    model_variables: dict,
    trainable: dict,
    noisy: jax.Array,
    t: jax.Array,
    cond_target: dict,  # the concept being steered (positive prompt embeds)
    cond_neutral: dict,  # neutral/empty prompt embeds
    cond_negative: dict,  # opposite-pole prompt embeds
    guidance_strength: float = 3.0,
    multiplier: float = 1.0,
) -> jax.Array:
    """Prompt-pair concept slider: push the adapter(+m) output toward
    prior(neutral) + strength * (prior(pos) - prior(neg)) (erase/enhance)."""
    base_vars = {k: v for k, v in model_variables.items() if k != "lora"}
    prior_neutral = jax.lax.stop_gradient(predict_fn(base_vars, noisy, t, cond_neutral))
    prior_pos = jax.lax.stop_gradient(predict_fn(base_vars, noisy, t, cond_target))
    prior_neg = jax.lax.stop_gradient(predict_fn(base_vars, noisy, t, cond_negative))
    target = prior_neutral + guidance_strength * (prior_pos - prior_neg)

    lora = scale_lora(trainable["lora"], multiplier)
    variables = merge_variables(model_variables, {**trainable, "lora": lora})
    pred = predict_fn(variables, noisy, t, cond_neutral)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def _double(v):
    if isinstance(v, jax.Array) or hasattr(v, "shape"):
        if getattr(v, "ndim", 0) >= 1 and v.shape[0] != 1:
            return jnp.concatenate([v, v], axis=0)
        return v
    return v
