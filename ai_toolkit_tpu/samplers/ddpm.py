"""DDPM-family schedule for epsilon / v-prediction models (SD1.x/2.x/SDXL).

Covers the reference's ddpm/ddim training+sampling paths
(``/root/reference/toolkit/sampler.py``) as one stateless schedule object:
scaled-linear betas, eps/v targets, SNR for min-SNR weighting
(``train_tools.apply_snr_weight``), and a DDIM sampling step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DDPMSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # scaled_linear | linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample

    # Tables are computed in numpy on the host: they are compile-time constants,
    # and a jnp cached_property first touched inside a jit trace would cache a
    # tracer (leak) instead of a value.
    @cached_property
    def betas(self) -> np.ndarray:
        n = self.num_train_timesteps
        if self.beta_schedule == "scaled_linear":
            return np.linspace(self.beta_start**0.5, self.beta_end**0.5, n, dtype=np.float32) ** 2
        if self.beta_schedule == "linear":
            return np.linspace(self.beta_start, self.beta_end, n, dtype=np.float32)
        if self.beta_schedule == "squaredcos_cap_v2":
            t = np.arange(n + 1, dtype=np.float32) / n
            f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
            alphas = f[1:] / f[:-1]
            return np.clip(1.0 - alphas, 0.0, 0.999)
        raise ValueError(f"unknown beta schedule {self.beta_schedule}")

    @cached_property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas).astype(np.float32)

    def sample_timesteps(self, rng: jax.Array, batch_size: int, min_t: int = 0, max_t: int | None = None) -> jax.Array:
        max_t = max_t if max_t is not None else self.num_train_timesteps
        return jax.random.randint(rng, (batch_size,), min_t, max_t)

    def _gather(self, table, t: jax.Array, ndim: int) -> jax.Array:
        v = jnp.asarray(table)[t]
        return v.reshape(v.shape + (1,) * (ndim - v.ndim))

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = self._gather(self.alphas_cumprod, t, x0.ndim).astype(x0.dtype)
        return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise

    def target(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            acp = self._gather(self.alphas_cumprod, t, x0.ndim).astype(x0.dtype)
            return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0
        if self.prediction_type == "sample":
            return x0
        raise ValueError(self.prediction_type)

    def snr(self, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod)[t]
        return acp / (1.0 - acp)

    def min_snr_weight(self, t: jax.Array, gamma: float) -> jax.Array:
        """min-SNR-gamma loss weight (Hang et al.); v-pred uses snr+1 in denominator."""
        snr = self.snr(t)
        w = jnp.minimum(snr, gamma)
        if self.prediction_type == "v_prediction":
            return w / (snr + 1.0)
        return w / jnp.maximum(snr, 1e-8)

    def pred_to_x0(self, pred: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        acp = self._gather(self.alphas_cumprod, t, x_t.ndim).astype(x_t.dtype)
        if self.prediction_type == "epsilon":
            return (x_t - jnp.sqrt(1.0 - acp) * pred) / jnp.sqrt(acp)
        if self.prediction_type == "v_prediction":
            return jnp.sqrt(acp) * x_t - jnp.sqrt(1.0 - acp) * pred
        return pred

    # ---- DDIM sampling ----

    def ddim_timesteps(self, num_steps: int) -> np.ndarray:
        step = self.num_train_timesteps // num_steps
        return (np.arange(num_steps) * step)[::-1] + 1

    def ddim_step(
        self,
        x_t: jax.Array,
        pred: jax.Array,
        t: jax.Array,
        t_prev: jax.Array,
        eta: float = 0.0,
    ) -> jax.Array:
        acp_t = self._gather(self.alphas_cumprod, t, x_t.ndim).astype(jnp.float32)
        acp_table = jnp.asarray(self.alphas_cumprod)
        acp_prev = jnp.where(t_prev >= 0, acp_table[jnp.maximum(t_prev, 0)], jnp.ones(()))
        acp_prev = acp_prev.reshape(acp_prev.shape + (1,) * (x_t.ndim - acp_prev.ndim))
        xf = x_t.astype(jnp.float32)
        pf = pred.astype(jnp.float32)
        x0 = self.pred_to_x0(pf, xf, t)
        if self.prediction_type == "epsilon":
            eps = pf
        else:
            eps = (xf - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
        dir_xt = jnp.sqrt(1.0 - acp_prev) * eps
        return (jnp.sqrt(acp_prev) * x0 + dir_xt).astype(x_t.dtype)
