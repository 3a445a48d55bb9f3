"""MeanFlow training: average-velocity distillation with dual time inputs.

Parity target: the reference's mean_flow adapter + loss
(``toolkit/models/mean_flow_adapter.py``; ``SDTrainer.get_mean_flow_loss``
SDTrainer.py:1060; sampler 'mean_flow' in toolkit/sampler.py) — trains a
flow-matching model to predict the *average* velocity u(z_t, r, t) over
[r, t] so sampling can jump in one (or few) steps.

MeanFlow identity (Geng et al., arXiv:2505.13447):
    u(z_t, r, t) = v_t - (t - r) * d/dt u(z_t, r, t)
with the total derivative  d/dt u = ∂_z u · v + ∂_t u  computed here in a
single forward via ``jax.jvp`` with tangents (v, 1) — the JAX-native
replacement for the reference's double-forward finite-difference path.

The second time r reaches the model through the 'mean_flow' CustomAdapter
(r-embedding tokens appended to the text context), so no per-arch surgery
is needed; with r == t the objective reduces to plain flow matching.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.train.state import TrainState, merge_variables
from ai_toolkit_tpu.train.step import TrainStepConfig, optax_global_norm


def make_mean_flow_train_step(
    predict_fn: Callable[..., jax.Array],
    schedule: Any,
    cfg: TrainStepConfig,
    flow_ratio: float = 0.25,
    adaptive_p: float = 0.5,
):
    """flow_ratio: fraction of samples with r < t (rest train r == t, plain FM).
    adaptive_p: adaptive loss weighting power (MeanFlow eq. 9; 0 disables)."""

    def loss_fn(trainable, model_variables, batch, rng, seq_len):
        x = batch["latents"]
        b = x.shape[0]
        rng_t, rng_r, rng_n, rng_m = jax.random.split(rng, 4)
        t = schedule.sample_timesteps(
            rng_t, b, timestep_type=cfg.timestep_type, image_seq_len=seq_len
        )
        # r uniform in [0, t); masked to r == t for (1 - flow_ratio) of samples
        r_raw = t * jax.random.uniform(rng_r, (b,))
        use_r = jax.random.uniform(rng_m, (b,)) < flow_ratio
        r = jnp.where(use_r, r_raw, t)

        noise = jax.random.normal(rng_n, x.shape, jnp.float32).astype(x.dtype)
        z = schedule.add_noise(x, noise, t)
        v = schedule.target(x, noise, t)  # eps - x0 = dz/dt

        variables = merge_variables(model_variables, trainable)
        cond = dict(batch.get("cond", {}))
        cond["mean_flow_r"] = r

        def u_fn(z_, t_):
            return predict_fn(variables, z_, t_, cond)

        u, dudt = jax.jvp(u_fn, (z, t), (v, jnp.ones_like(t)))
        gap = (t - r).reshape((b,) + (1,) * (x.ndim - 1))
        u_tgt = jax.lax.stop_gradient(
            v.astype(jnp.float32) - gap * dudt.astype(jnp.float32)
        )
        err = jnp.square(u.astype(jnp.float32) - u_tgt)
        if adaptive_p > 0:
            # adaptive weighting w = 1 / (err_norm + c)^p, stop-grad
            axes = tuple(range(1, x.ndim))
            per = err.mean(axes)
            w = jax.lax.stop_gradient(1.0 / jnp.power(per + 1e-3, adaptive_p))
            loss = jnp.mean(w * per)
        else:
            loss = jnp.mean(err)
        return loss, {"raw_mse": jnp.mean(err)}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array, image_seq_len=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = grad_fn(
            state.trainable, state.model_variables, batch, rng, image_seq_len
        )
        new_state = state.apply_gradients(grads, ema_decay=cfg.ema_decay)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads), **aux}

    return train_step


def mean_flow_sample(
    predict_fn, variables: dict, z: jax.Array, cond: dict, steps: int = 1
) -> jax.Array:
    """Few-step sampling with an average-velocity model: each segment jumps
    z_r = z_t - (t - r) * u(z_t, r, t) (reference 'mean_flow' sampler)."""
    ts = jnp.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        t = jnp.full((z.shape[0],), ts[i])
        r = jnp.full((z.shape[0],), ts[i + 1])
        u = predict_fn(variables, z, t, {**cond, "mean_flow_r": r})
        z = z - (ts[i] - ts[i + 1]) * u.astype(z.dtype)
    return z
