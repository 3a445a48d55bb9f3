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


# ---- guided-loss family (reference toolkit/guidance.py:716 dispatcher) ----

def _value_map(x, in_min, in_max, out_min, out_max):
    return out_min + (x - in_min) * (out_max - out_min) / jnp.maximum(in_max - in_min, 1e-8)


def _per_sample_minmax(x):
    """min/max over all non-batch dims, keepdims (guidance.py:314-320)."""
    axes = tuple(range(1, x.ndim))
    return (
        jnp.min(x, axis=axes, keepdims=True),
        jnp.max(x, axis=axes, keepdims=True),
    )


def _mse(a, b):
    return jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))


def make_guided_train_step(
    kind: str,
    predict_fn: Callable[..., jax.Array],
    schedule: Any,
    cfg: TrainStepConfig,
    network_weight: float = 1.0,
):
    """Paired-image guidance objectives (reference get_guidance_loss
    dispatcher, guidance.py:716-831). All kinds need batches carrying
    'latents' (conditional) + 'unconditional_latents' + shared 'cond'.

    - targeted  (guidance.py:278): adapter-off prior on the unconditional
      image anchors a |cond_loss - prior_loss| objective scaled by the latent
      differential, plus a polar |cond_loss - uncond_loss| term; the
      unconditional half runs at multiplier (w-1).
    - direct    (guidance.py:191): CFG-combined prediction over the pair
      regressed to the true noise (guidance_scale 1.1).
    - tnt       (guidance.py:521): "this-not-that" — minimize loss on 'this'
      half while maximizing (scaled, 0.01) on 'that' half.
    - targeted_flow (guidance.py:612, flow-matching only): baseline noise
      recovered from the adapter-off prediction on the unconditional image
      is blended with fresh noise by the |differential| mask to form the
      flow target for the conditional prediction.
    - targeted_polarity (guidance.py:60): targeted at +w and with the pair
      swapped at -w, averaged (polarity-symmetric form).
    """

    def _pair_setup(batch, rng, seq_len):
        pos = batch["latents"]
        neg = batch["unconditional_latents"]
        b = pos.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        if hasattr(schedule, "euler_step"):
            t = schedule.sample_timesteps(
                rng_t, b, timestep_type=cfg.timestep_type, image_seq_len=seq_len
            )
        else:
            t = schedule.sample_timesteps(rng_t, b)
        noise = jax.random.normal(rng_n, pos.shape, jnp.float32).astype(pos.dtype)
        return pos, neg, t, noise

    def _targeted_half(trainable, model_variables, cond, cond_lat, uncond_lat, t, noise, w):
        noisy_c = schedule.add_noise(cond_lat, noise, t)
        noisy_u = schedule.add_noise(uncond_lat, noise, t)
        base_vars = {k: v for k, v in model_variables.items() if k != "lora"}
        prior = jax.lax.stop_gradient(predict_fn(base_vars, noisy_u, t, cond))
        prior_loss = jax.lax.stop_gradient(_mse(prior, noise))
        diff = jax.lax.stop_gradient(jnp.abs(uncond_lat - cond_lat).astype(jnp.float32))
        dmin, dmax = _per_sample_minmax(diff)
        scaler = jax.lax.stop_gradient(_value_map(diff, dmin, dmax, 1.0, 2.0))

        b = cond_lat.shape[0]
        mult = jnp.concatenate([jnp.full((b,), w), jnp.full((b,), w - 1.0)])
        lora = scale_lora(trainable["lora"], mult)
        variables = merge_variables(model_variables, {**trainable, "lora": lora})
        cond2 = {k: _double(v) for k, v in cond.items()}
        pred = predict_fn(
            variables, jnp.concatenate([noisy_c, noisy_u]), jnp.concatenate([t, t]), cond2
        )
        pred_c, pred_u = jnp.split(pred, 2, axis=0)
        cond_loss = _mse(pred_c, noise)
        uncond_loss = _mse(pred_u, noise)
        positive = jnp.mean(jnp.abs(cond_loss - prior_loss) * scaler)
        polar = jnp.mean(jnp.abs(cond_loss - uncond_loss))
        return positive + polar

    def loss_fn(trainable, model_variables, batch, rng, seq_len):
        cond = batch.get("cond", {})
        pos, neg, t, noise = _pair_setup(batch, rng, seq_len)
        b = pos.shape[0]

        if kind == "targeted":
            return _targeted_half(
                trainable, model_variables, cond, pos, neg, t, noise, network_weight
            ), {}
        if kind == "targeted_polarity":
            l1 = _targeted_half(trainable, model_variables, cond, pos, neg, t, noise,
                                network_weight)
            l2 = _targeted_half(trainable, model_variables, cond, neg, pos, t, noise,
                                -network_weight)
            return 0.5 * (l1 + l2), {}

        noisy_c = schedule.add_noise(pos, noise, t)
        noisy_u = schedule.add_noise(neg, noise, t)

        if kind == "direct":
            mult = jnp.full((2 * b,), network_weight)
            lora = scale_lora(trainable["lora"], mult)
            variables = merge_variables(model_variables, {**trainable, "lora": lora})
            cond2 = {k: _double(v) for k, v in cond.items()}
            pred = predict_fn(
                variables, jnp.concatenate([noisy_u, noisy_c]), jnp.concatenate([t, t]), cond2
            )
            pred_u, pred_c = jnp.split(pred, 2, axis=0)
            guidance_scale = 1.1
            guided = pred_u + guidance_scale * (pred_c - pred_u)
            return jnp.mean(_mse(guided, noise)), {}

        if kind == "tnt":
            mult = jnp.full((2 * b,), network_weight)
            lora = scale_lora(trainable["lora"], mult)
            variables = merge_variables(model_variables, {**trainable, "lora": lora})
            cond2 = {k: _double(v) for k, v in cond.items()}
            pred = predict_fn(
                variables, jnp.concatenate([noisy_c, noisy_u]), jnp.concatenate([t, t]), cond2
            )
            pred_this, pred_that = jnp.split(pred, 2, axis=0)
            axes = tuple(range(1, pos.ndim))
            this_loss = _mse(pred_this, noise).mean(axes)
            that_loss = -_mse(pred_that, noise).mean(axes)
            scaler = jax.lax.stop_gradient(
                jnp.abs(this_loss) / jnp.maximum(jnp.abs(that_loss), 1e-8)
            )
            return jnp.mean(this_loss + that_loss * scaler * 0.01), {}

        if kind == "targeted_flow":
            # flow-matching target blend (guidance.py:612-100)
            diff = jnp.abs(neg - pos).astype(jnp.float32)
            dmin, dmax = _per_sample_minmax(diff)
            mask = jax.lax.stop_gradient(_value_map(diff, dmin, dmax, 0.0, 1.0))
            base_vars = {k: v for k, v in model_variables.items() if k != "lora"}
            baseline = jax.lax.stop_gradient(predict_fn(base_vars, noisy_u, t, cond))
            baseline_noise = baseline.astype(jnp.float32) + neg.astype(jnp.float32)
            target_noise = mask * noise.astype(jnp.float32) + (1.0 - mask) * baseline_noise
            target_pred = jax.lax.stop_gradient(target_noise - pos.astype(jnp.float32))
            lora = scale_lora(trainable["lora"], jnp.full((b,), network_weight))
            variables = merge_variables(model_variables, {**trainable, "lora": lora})
            pred = predict_fn(variables, noisy_c, t, cond)
            return jnp.mean(_mse(pred, target_pred)), {}

        raise NotImplementedError(f"guidance kind '{kind}'")

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array, image_seq_len=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = grad_fn(state.trainable, state.model_variables, batch, rng, image_seq_len)
        new_state = state.apply_gradients(grads, ema_decay=cfg.ema_decay)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return train_step


def make_concept_replacer_train_step(
    predict_fn: Callable[..., jax.Array],
    schedule: Any,
    cfg: TrainStepConfig,
    network_weight: float = 1.0,
):
    """Concept replacement (reference extensions_built_in/concept_replacer/
    ConceptReplacer.py:42-130): the adapter-ON prediction conditioned on the
    concept-wrapped prompt regresses to the adapter-OFF prediction conditioned
    on the replacement-wrapped prompt — the concept's meaning is steered to
    the replacement. Batch carries 'cond' (concept embeds) and
    'replacement_cond' (replacement embeds)."""

    def loss_fn(trainable, model_variables, batch, rng, seq_len):
        x = batch["latents"]
        b = x.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        if hasattr(schedule, "euler_step"):
            t = schedule.sample_timesteps(
                rng_t, b, timestep_type=cfg.timestep_type, image_seq_len=seq_len
            )
        else:
            t = schedule.sample_timesteps(rng_t, b)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32).astype(x.dtype)
        noisy = schedule.add_noise(x, noise, t)

        base_vars = {k: v for k, v in model_variables.items() if k != "lora"}
        target = jax.lax.stop_gradient(
            predict_fn(base_vars, noisy, t, batch["replacement_cond"])
        )
        lora = scale_lora(trainable["lora"], jnp.full((b,), network_weight))
        variables = merge_variables(model_variables, {**trainable, "lora": lora})
        pred = predict_fn(variables, noisy, t, batch["cond"])
        return jnp.mean(_mse(pred, target)), {}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array, image_seq_len=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = grad_fn(state.trainable, state.model_variables, batch, rng, image_seq_len)
        new_state = state.apply_gradients(grads, ema_decay=cfg.ema_decay)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return train_step
