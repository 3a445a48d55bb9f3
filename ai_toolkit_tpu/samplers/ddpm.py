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

    def sample_timesteps(
        self,
        rng: jax.Array,
        batch_size: int,
        min_t: int = 0,
        max_t: int | None = None,
        content_or_style: str = "balanced",
        timestep_type: str | None = None,
        next_sample_timesteps: int | None = None,
    ) -> jax.Array:
        """Timestep indices per the reference's distribution zoo
        (BaseSDTrainProcess.py:1243-1313): discrete two/four/eight_step grids,
        one_step/next_sample, cubic content/style skews (T2I-Adapter §3.4),
        or the balanced uniform draw."""
        n = self.num_train_timesteps
        max_t = max_t if max_t is not None else n
        if timestep_type in ("two_step", "four_step", "eight_step"):
            k = {"two_step": 2, "four_step": 4, "eight_step": 8}[timestep_type]
            choices = jnp.arange(k) * (n // k)
            if timestep_type == "two_step":
                choices = jnp.array([0, n // 2 - 1])  # reference uses [0, 499]
            pick = jax.random.randint(rng, (batch_size,), 0, choices.shape[0])
            return choices[pick]
        if timestep_type == "one_step":
            return jnp.zeros((batch_size,), jnp.int32)
        if timestep_type == "next_sample":
            # indices into a reduced K-step ladder, mapped back to the full
            # scale (reference next_sample_timesteps, BaseSDTrainProcess:1202)
            k = next_sample_timesteps or n
            idx = jax.random.randint(rng, (batch_size,), 0, max(k - 2, 1))
            return idx * (n // k)
        if content_or_style in ("content", "style"):
            # cubic skew: content favors early (low-noise) timesteps, style
            # favors late ones, mapped into the [min_t, max_t] window
            u = jax.random.uniform(rng, (batch_size,))
            idx = (u**3 if content_or_style == "content" else 1.0 - u**3) * n
            idx = min_t + idx * (max_t - 1 - min_t) / max(n - 1, 1)
            return jnp.clip(idx.astype(jnp.int32), min_t, max_t - 1)
        if content_or_style != "balanced":
            raise ValueError(f"unknown content_or_style {content_or_style!r}")
        lo = min_t + 1
        hi = max(lo + 1, max_t - 1)
        return jax.random.randint(rng, (batch_size,), lo, hi)

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

    # ---- k-diffusion-style inference steppers (reference get_sampler zoo:
    # euler_a / dpm++ families, toolkit/sampler.py:120-180) ----

    def sigma_table(self) -> np.ndarray:
        """karras-convention sigmas per train timestep: sqrt((1-acp)/acp)."""
        acp = self.alphas_cumprod
        return np.sqrt((1.0 - acp) / acp)

    def inference_sigmas(self, num_steps: int, karras: bool = False) -> np.ndarray:
        """descending sigma schedule over the trained range, 0-terminated.

        karras=True: rho-7 ramp between the trained sigma_min/max (the
        reference's ``k_``-prefixed samplers set use_karras_sigmas)."""
        table = self.sigma_table()
        if karras:
            rho = 7.0
            smin, smax = float(table[0]), float(table[-1])
            ramp = np.linspace(0, 1, num_steps)
            sig = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
            return np.append(sig, 0.0)
        idx = np.linspace(len(table) - 1, 0, num_steps).round().astype(int)
        return np.append(table[idx], 0.0)

    def timestep_for_sigma(self, sigma: float) -> int:
        return int(np.abs(self.sigma_table() - sigma).argmin())

    @staticmethod
    def scale_model_input(x: jax.Array, sigma: float) -> jax.Array:
        return x / float(np.sqrt(sigma * sigma + 1.0))

    def denoised_from_eps(self, x: jax.Array, eps: jax.Array, sigma: float) -> jax.Array:
        """k-diffusion 'denoised' (x0 estimate) from an epsilon prediction on
        the scaled input."""
        xf = x.astype(jnp.float32)
        ef = eps.astype(jnp.float32)
        s = float(sigma)
        if self.prediction_type == "v_prediction":
            # v-pred on scaled input: denoised = x/(s^2+1) - v * s/sqrt(s^2+1)
            return xf / (s * s + 1.0) - ef * (s / np.sqrt(s * s + 1.0))
        return xf - s * ef

    @staticmethod
    def euler_ancestral_step(
        x: jax.Array, denoised: jax.Array, sigma: float, sigma_next: float, rng: jax.Array
    ) -> jax.Array:
        xf = x.astype(jnp.float32)
        if sigma_next == 0:
            return denoised.astype(x.dtype)
        su2 = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
        sigma_up = float(np.sqrt(max(su2, 0.0)))
        sigma_down = float(np.sqrt(max(sigma_next**2 - sigma_up**2, 0.0)))
        d = (xf - denoised.astype(jnp.float32)) / sigma
        xf = xf + d * (sigma_down - sigma)
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        return (xf + noise * sigma_up).astype(x.dtype)

    @staticmethod
    def heun_step(x, denoised, sigma, sigma_next, denoised_fn):
        """Heun's method (k-diffusion sample_heun, deterministic 2nd order).

        ``denoised_fn(x, sigma) -> denoised`` supplies the correction-stage
        model evaluation at the euler-predicted point."""
        xf = x.astype(jnp.float32)
        d = (xf - denoised.astype(jnp.float32)) / sigma
        x_euler = xf + d * (sigma_next - sigma)
        if sigma_next == 0:
            return x_euler.astype(x.dtype)
        den2 = denoised_fn(x_euler.astype(x.dtype), sigma_next).astype(jnp.float32)
        d2 = (x_euler - den2) / sigma_next
        return (xf + (d + d2) * 0.5 * (sigma_next - sigma)).astype(x.dtype)

    @staticmethod
    def lms_coefficients(order: int, sigmas: np.ndarray, i: int) -> list[float]:
        """Integrated-Lagrange linear-multistep coefficients (k-diffusion
        ``linear_multistep_coeff`` / diffusers LMSDiscreteScheduler)."""

        def integrand(tau, j):
            prod = np.ones_like(tau)
            for k in range(order):
                if k == j:
                    continue
                prod = prod * (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
            return prod

        out = []
        xs = np.linspace(sigmas[i], sigmas[i + 1], 513)
        for j in range(order):
            ys = integrand(xs, j)
            out.append(float(np.trapezoid(ys, xs)))
        return out

    @staticmethod
    def lms_step(x, d_history: list, coeffs: list[float]):
        """x_{i+1} = x_i + sum_j c_j * d_{i-j}; ``d_history`` newest-first."""
        xf = x.astype(jnp.float32)
        for c, d in zip(coeffs, d_history):
            xf = xf + c * d.astype(jnp.float32)
        return xf.astype(x.dtype)

    # ---- LCM (diffusers LCMScheduler; consistency boundary conditions) ----

    def lcm_timesteps(self, num_steps: int, original_steps: int = 50) -> np.ndarray:
        k = self.num_train_timesteps // original_steps
        origin = np.arange(1, original_steps + 1) * k - 1
        skip = max(len(origin) // num_steps, 1)
        return origin[::-1][::skip][:num_steps]

    def lcm_step(
        self, x: jax.Array, pred: jax.Array, t: int, t_prev: int,
        rng: jax.Array, timestep_scaling: float = 10.0, sigma_data: float = 0.5,
    ) -> jax.Array:
        """One LCM step: consistency-parameterized x0 + re-noising to the next
        timestep (diffusers LCMScheduler.step)."""
        xf = x.astype(jnp.float32)
        x0 = self.pred_to_x0(pred.astype(jnp.float32), xf, jnp.full((1,), t, jnp.int32))
        scaled = t * timestep_scaling
        c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
        c_out = scaled / float(np.sqrt(scaled**2 + sigma_data**2))
        denoised = c_out * x0 + c_skip * xf
        if t_prev < 0:
            return denoised.astype(x.dtype)
        acp_prev = float(self.alphas_cumprod[t_prev])
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        return (
            np.sqrt(acp_prev) * denoised + np.sqrt(1.0 - acp_prev) * noise
        ).astype(x.dtype)

    # ---- PNDM (diffusers PNDMScheduler, plms path / skip_prk_steps) ----

    def pndm_timesteps(self, num_steps: int) -> np.ndarray:
        step = self.num_train_timesteps // num_steps
        return ((np.arange(num_steps) * step).round().astype(int) + 1)[::-1]

    def pndm_prev_sample(self, x: jax.Array, t: int, t_prev: int, eps: jax.Array) -> jax.Array:
        """The PNDM transfer formula (diffusers ``PNDMScheduler._get_prev_sample``)."""
        acp_t = float(self.alphas_cumprod[t])
        acp_prev = float(self.alphas_cumprod[t_prev]) if t_prev >= 0 else 1.0
        xf = x.astype(jnp.float32)
        ef = eps.astype(jnp.float32)
        sample_coeff = (acp_prev / acp_t) ** 0.5
        denom = acp_t * (1.0 - acp_prev) ** 0.5 + (
            acp_t * (1.0 - acp_t) * acp_prev
        ) ** 0.5
        return (sample_coeff * xf - (acp_prev - acp_t) * ef / denom).astype(x.dtype)

    @staticmethod
    def dpm_2_step(
        x: jax.Array, denoised: jax.Array, sigma: float, sigma_next: float,
        denoised_fn,
    ) -> jax.Array:
        """KDPM2 / k-diffusion sample_dpm_2: 2nd-order with a log-space
        midpoint sigma (reference sampler 'dpm_2' -> KDPM2DiscreteScheduler)."""
        xf = x.astype(jnp.float32)
        df = denoised.astype(jnp.float32)
        d = (xf - df) / sigma
        if sigma_next == 0:
            return (xf + d * (sigma_next - sigma)).astype(x.dtype)
        sigma_mid = float(np.exp(np.log(sigma) * 0.5 + np.log(sigma_next) * 0.5))
        x_2 = xf + d * (sigma_mid - sigma)
        den2 = denoised_fn(x_2.astype(x.dtype), sigma_mid).astype(jnp.float32)
        d_2 = (x_2 - den2) / sigma_mid
        return (xf + d_2 * (sigma_next - sigma)).astype(x.dtype)

    @staticmethod
    def dpm_2_a_step(
        x: jax.Array, denoised: jax.Array, sigma: float, sigma_next: float,
        rng: jax.Array, denoised_fn,
    ) -> jax.Array:
        """KDPM2Ancestral / sample_dpm_2_ancestral (reference 'dpm_2_a')."""
        xf = x.astype(jnp.float32)
        df = denoised.astype(jnp.float32)
        d = (xf - df) / sigma
        if sigma_next == 0:
            return df.astype(x.dtype)
        su2 = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
        sigma_up = float(np.sqrt(max(su2, 0.0)))
        sigma_down = float(np.sqrt(max(sigma_next**2 - sigma_up**2, 0.0)))
        if sigma_down == 0:
            xf = xf + d * (sigma_down - sigma)
        else:
            sigma_mid = float(np.exp(np.log(sigma) * 0.5 + np.log(sigma_down) * 0.5))
            x_2 = xf + d * (sigma_mid - sigma)
            den2 = denoised_fn(x_2.astype(x.dtype), sigma_mid).astype(jnp.float32)
            d_2 = (x_2 - den2) / sigma_mid
            xf = xf + d_2 * (sigma_down - sigma)
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        return (xf + noise * sigma_up).astype(x.dtype)

    @staticmethod
    def dpmpp_2s_step(
        x: jax.Array, denoised: jax.Array, sigma: float, sigma_next: float,
        denoised_fn,
    ) -> jax.Array:
        """DPM-Solver++(2S) singlestep, data prediction (reference
        'dpmsingle' -> DPMSolverSinglestepScheduler): two model calls per
        step combined in t = -log(sigma) space."""
        xf = x.astype(jnp.float32)
        df = denoised.astype(jnp.float32)
        if sigma_next == 0:
            return df.astype(x.dtype)
        t, t_next = -np.log(sigma), -np.log(sigma_next)
        s_mid = t + 0.5 * (t_next - t)
        sig_mid = float(np.exp(-s_mid))
        x_2 = (sig_mid / sigma) * xf - float(np.expm1(t - s_mid)) * df
        den2 = denoised_fn(x_2.astype(x.dtype), sig_mid).astype(jnp.float32)
        out = (sigma_next / sigma) * xf - float(np.expm1(t - t_next)) * den2
        return out.astype(x.dtype)

    @staticmethod
    def dpmpp_2m_step(
        x: jax.Array,
        denoised: jax.Array,
        prev_denoised: jax.Array | None,
        sigma_prev: float | None,
        sigma: float,
        sigma_next: float,
    ) -> jax.Array:
        """DPM-Solver++(2M) (multistep second order, deterministic)."""
        xf = x.astype(jnp.float32)
        df = denoised.astype(jnp.float32)
        if sigma_next == 0:
            return df.astype(x.dtype)
        t, t_next = -np.log(sigma), -np.log(sigma_next)
        h = t_next - t
        if prev_denoised is None or sigma_prev is None:
            d_d = df
        else:
            h_prev = t - (-np.log(sigma_prev))
            r = h_prev / h
            d_d = (1 + 1 / (2 * r)) * df - (1 / (2 * r)) * prev_denoised.astype(jnp.float32)
        out = (sigma_next / sigma) * xf - float(np.expm1(-h)) * d_d
        return out.astype(x.dtype)
