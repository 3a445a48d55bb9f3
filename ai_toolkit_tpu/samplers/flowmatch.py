"""Flow-matching schedule: train-time timestep distributions + Euler sampling.

Math parity with the reference's ``CustomFlowMatchEulerDiscreteScheduler``
(``/root/reference/toolkit/samplers/custom_flowmatch_sampler.py``): forward
process ``x_t = (1-t) x0 + t eps``, velocity target ``eps - x0``, and the full
set of train-time timestep distributions (linear, sigmoid, shift, flux_shift
with dynamic mu by image seq len, lognorm_blend, weighted/bell). Redesigned
TPU-first: distributions are *sampled per-example inside the jitted train step*
(pure functions of an rng key) instead of materializing a mutable timestep pool
on the scheduler object.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def calculate_flux_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.16,
) -> float:
    """Dynamic shift mu as a function of image sequence length (flux inference rule)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma: float, t: jax.Array, kind: str = "exp") -> jax.Array:
    """Dynamic shift of uniform times (diffusers FlowMatch): 'exp' (flux) or
    'linear' (cogview4 scheduler_config time_shift_type, mu used directly)."""
    m = mu if kind == "linear" else math.exp(mu)
    return m / (m + (1.0 / t - 1.0) ** sigma)


def _bell_weights(num: int = 1000) -> jnp.ndarray:
    """Bell-shaped mean-normalized timestep weights (reference 'bsmntw')."""
    x = jnp.arange(num, dtype=jnp.float32)
    y = jnp.exp(-2.0 * ((x - num / 2) / num) ** 2)
    y = y - y.min()
    return y * (num / y.sum())


def _half_bell_weights(num: int = 1000) -> jnp.ndarray:
    w = _bell_weights(num)
    return w.at[num // 2 :].set(w[num // 2 :].max())


@dataclass(frozen=True)
class FlowMatchSchedule:
    """Stateless flow-matching schedule. t=1 is pure noise, t=0 is data."""

    num_train_timesteps: int = 1000
    shift: float = 3.0  # static shift (sd3/lumina style) for timestep_type='shift'
    use_dynamic_shifting: bool = True  # flux-style
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096
    base_shift: float = 0.5
    max_shift: float = 1.16
    # 'exp' (flux) or 'linear' (cogview4: mu enters the shift un-exponentiated)
    time_shift_type: str = "exp"
    # user-provided per-timestep loss-weight table (reference
    # timestep_weighing/default_weighing_scheme.py precomputed scheme);
    # tuple of num_train_timesteps floats, used by timestep_type='weighted'
    weighting_table: tuple | None = None

    # ---- training ----

    def sample_timesteps(
        self,
        rng: jax.Array,
        batch_size: int,
        timestep_type: str = "sigmoid",
        image_seq_len: int | None = None,
        timestep_bias: float = 1.0,
    ) -> jax.Array:
        """Sample t in (0, 1) per example according to the configured distribution."""
        u = jax.random.uniform(rng, (batch_size,), minval=1e-4, maxval=1.0 - 1e-4)
        if timestep_type in ("linear", "weighted"):
            t = u
        elif timestep_type == "sigmoid":
            t = jax.nn.sigmoid(jax.random.normal(rng, (batch_size,)))
        elif timestep_type in ("shift", "lumina2_shift"):
            t = self.shift * u / (1.0 + (self.shift - 1.0) * u)
        elif timestep_type == "flux_shift":
            seq = image_seq_len if image_seq_len is not None else 1024
            mu = calculate_flux_shift(
                seq, self.base_image_seq_len, self.max_image_seq_len, self.base_shift, self.max_shift
            )
            t = time_shift(mu, 1.0, u, self.time_shift_type)
        elif timestep_type == "lognorm_blend":
            # 75% biased toward the noisy end via lognormal, 25% uniform
            z = jnp.exp(jax.random.normal(rng, (batch_size,)) * 0.333)
            t1 = 1.0 - z / jnp.max(z)
            pick = jax.random.uniform(jax.random.fold_in(rng, 1), (batch_size,)) < 0.75
            t = jnp.where(pick, t1, u)
        elif timestep_type == "one_step":
            t = jnp.ones((batch_size,))
        else:
            raise ValueError(f"unknown timestep_type: {timestep_type}")
        if timestep_bias != 1.0:
            t = jnp.power(t, timestep_bias)
        return jnp.clip(t, 1e-5, 1.0)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """x_t = (1-t) x0 + t noise (t broadcast from [B] over sample dims)."""
        t = t.reshape(t.shape + (1,) * (x0.ndim - t.ndim)).astype(x0.dtype)
        return (1.0 - t) * x0 + t * noise

    def target(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Velocity target v = eps - x0 (reference convention)."""
        return noise - x0

    def pred_to_x0(self, pred: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        """Step a velocity prediction all the way to x0: x0 = x_t - t * v."""
        t = t.reshape(t.shape + (1,) * (x_t.ndim - t.ndim)).astype(x_t.dtype)
        return x_t - t * pred

    def training_sigmas(self) -> jnp.ndarray:
        """The N-entry descending train-time sigma table — the reference
        scheduler's ``self.sigmas`` before ``set_timesteps`` (diffusers
        FlowMatchEulerDiscreteScheduler.__init__: linspace shifted by the
        static shift unless dynamic shifting is on)."""
        sig = jnp.linspace(1.0, 1.0 / self.num_train_timesteps, self.num_train_timesteps)
        if not self.use_dynamic_shifting and self.shift != 1.0:
            sig = self.shift * sig / (1.0 + (self.shift - 1.0) * sig)
        return sig

    def stepped_x0(
        self, pred: jax.Array, noisy: jax.Array, noise: jax.Array, t: jax.Array,
        step_ahead: int = 50,
    ) -> jax.Array:
        """Reference ``stepped_loss`` recovery (toolkit/util/losses.py:50-93),
        vectorized: Euler-step the velocity pred ``step_ahead`` indices down
        the training sigma table, then invert the forward process at the
        target sigma to recover x0. TPU-first: one searchsorted + gathers
        instead of the reference's per-sample Python loop."""
        sig = self.training_sigmas()  # [N], descending
        n = sig.shape[0]
        asc = sig[::-1]
        # nearest table index to each sample's sigma (scheduler _init_step_index)
        pos = jnp.clip(jnp.searchsorted(asc, t), 1, n - 1)
        left, right = asc[pos - 1], asc[pos]
        pos = jnp.where(jnp.abs(t - left) <= jnp.abs(right - t), pos - 1, pos)
        idx = (n - 1) - pos  # back to descending-table index
        tgt = jnp.minimum(idx + step_ahead, n - 1)
        expand = t.shape + (1,) * (noisy.ndim - t.ndim)
        s0 = sig[idx].reshape(expand)
        s1 = sig[tgt].reshape(expand)
        stepped = noisy.astype(jnp.float32) + (s1 - s0) * pred.astype(jnp.float32)
        return (stepped - s1 * noise.astype(jnp.float32)) / (1.0 - s1)

    def loss_weights(
        self, t: jax.Array, timestep_type: str = "linear", v2: bool = False
    ) -> jax.Array:
        """Per-example loss weights (bell / half-bell / table lookup by timestep)."""
        idx = jnp.clip(
            (t * self.num_train_timesteps).astype(jnp.int32), 0, self.num_train_timesteps - 1
        )
        if timestep_type == "weighted":
            if self.weighting_table is not None:
                table = jnp.asarray(self.weighting_table, jnp.float32)
                table = table / jnp.mean(table)  # mean-normalized like the reference
            else:
                table = _bell_weights(self.num_train_timesteps)  # built-in fallback
            return table[idx]
        table = _half_bell_weights(self.num_train_timesteps) if v2 else _bell_weights(
            self.num_train_timesteps
        )
        return table[idx]

    # ---- inference (Euler) ----

    def inference_sigmas(
        self, num_steps: int, image_seq_len: int | None = None
    ) -> jnp.ndarray:
        """Monotone decreasing sigma schedule [num_steps+1], from 1.0 to 0.0."""
        sigmas = jnp.linspace(1.0, 1.0 / self.num_train_timesteps, num_steps)
        if self.use_dynamic_shifting and image_seq_len is not None:
            mu = calculate_flux_shift(
                image_seq_len,
                self.base_image_seq_len,
                self.max_image_seq_len,
                self.base_shift,
                self.max_shift,
            )
            sigmas = time_shift(mu, 1.0, sigmas, self.time_shift_type)
        else:
            sigmas = self.shift * sigmas / (1.0 + (self.shift - 1.0) * sigmas)
        return jnp.concatenate([sigmas, jnp.zeros((1,))])

    def euler_step(
        self, x: jax.Array, velocity: jax.Array, sigma: jax.Array, sigma_next: jax.Array
    ) -> jax.Array:
        return x + (sigma_next - sigma) * velocity.astype(x.dtype)
