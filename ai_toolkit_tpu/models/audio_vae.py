"""1D causal waveform VAE for latent audio diffusion (ACE-Step-class role).

The reference's audio family (``extensions_built_in/audio_models/ace_step/``)
trains a DiT over compressed audio latents. Here: strided 1D causal conv
encoder/decoder, ~x**n_stages temporal compression, KL latent. NLC layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class AudioVAEConfig:
    in_channels: int = 2  # stereo
    latent_channels: int = 64
    base_channels: int = 64
    channel_multipliers: tuple[int, ...] = (1, 2, 4, 8, 8)
    stride: int = 4  # per downsample stage -> 4^4 = 256x compression
    scaling_factor: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def default(cls) -> "AudioVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "AudioVAEConfig":
        return cls(latent_channels=4, base_channels=8, channel_multipliers=(1, 2),
                   stride=4, dtype=jnp.float32)

    @property
    def downscale(self) -> int:
        return self.stride ** (len(self.channel_multipliers) - 1)


class CausalConv1d(nn.Module):
    features: int
    kernel_size: int = 7
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        pad = self.kernel_size - self.stride
        x = jnp.pad(x, ((0, 0), (max(pad, 0), 0), (0, 0)))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.kernel_size, x.shape[-1], self.features),
            self.dtype,
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (self.stride,), "VALID",
            dimension_numbers=dn,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.dtype)
        return y + bias


class ResBlock1d(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = CausalConv1d(self.ch, 7, dtype=self.dtype, name="conv1")(nn.silu(x))
        h = CausalConv1d(self.ch, 1, dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.ch:
            x = CausalConv1d(self.ch, 1, dtype=self.dtype, name="shortcut")(x)
        return x + h


class AudioAutoencoderKL(nn.Module):
    cfg: AudioVAEConfig

    def setup(self):
        cfg = self.cfg
        self.enc_in = CausalConv1d(cfg.base_channels, 7, dtype=cfg.dtype)
        self.enc_blocks = [
            (ResBlock1d(cfg.base_channels * m, cfg.dtype),
             CausalConv1d(cfg.base_channels * m, cfg.stride * 2, cfg.stride, dtype=cfg.dtype)
             if i < len(cfg.channel_multipliers) - 1 else None)
            for i, m in enumerate(cfg.channel_multipliers)
        ]
        self.enc_out = CausalConv1d(2 * cfg.latent_channels, 3, dtype=cfg.dtype)
        self.dec_in = CausalConv1d(cfg.base_channels * cfg.channel_multipliers[-1], 3, dtype=cfg.dtype)
        self.dec_blocks = [
            (ResBlock1d(cfg.base_channels * m, cfg.dtype),
             CausalConv1d(cfg.base_channels * m, cfg.stride * 2, 1, dtype=cfg.dtype)
             if i < len(cfg.channel_multipliers) - 1 else None)
            for i, m in reversed(list(enumerate(cfg.channel_multipliers)))
        ]
        self.dec_out = CausalConv1d(cfg.in_channels, 7, dtype=cfg.dtype)

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        h = self.enc_in(x)
        for res, down in self.enc_blocks:
            h = res(h)
            if down is not None:
                h = down(h)
        moments = self.enc_out(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.cfg.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        h = self.dec_in(z / self.cfg.scaling_factor)
        for res, up in self.dec_blocks:
            h = res(h)
            if up is not None:
                b, t, c = h.shape
                h = jax.image.resize(h, (b, t * self.cfg.stride, c), "nearest")
                h = up(h)
        return self.dec_out(h)

    def __call__(self, x):
        return self.decode(self.encode(x))
