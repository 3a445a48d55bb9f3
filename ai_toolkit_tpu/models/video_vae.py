"""Causal 3D video VAE (Wan-class), NDHWC.

Covers the reference's Wan VAE role (3D causal conv autoencoder, 4x temporal /
8x spatial compression, 16 latent channels; first frame encoded standalone so
``num_frames = 4k+1``). Causality = left-only temporal padding, so streaming
decode stays possible. Tiny config for CPU tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import GroupNorm

Dtype = jnp.dtype


@dataclass(frozen=True)
class VideoVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    base_channels: int = 96
    channel_multipliers: tuple[int, ...] = (1, 2, 4, 4)
    temporal_downscales: tuple[bool, ...] = (False, True, True, False)  # 4x total
    layers_per_block: int = 2
    scaling_factor: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def wan(cls) -> "VideoVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VideoVAEConfig":
        return cls(
            latent_channels=4, base_channels=8, channel_multipliers=(1, 2),
            temporal_downscales=(True, False), layers_per_block=1, dtype=jnp.float32,
        )

    @property
    def spatial_downscale(self) -> int:
        return 2 ** (len(self.channel_multipliers) - 1)

    @property
    def temporal_downscale(self) -> int:
        return 2 ** sum(self.temporal_downscales)


class CausalConv3d(nn.Module):
    """Conv3d with causal (left-only) temporal padding. Input [B,T,H,W,C]."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        pad_t = kt - 1  # all on the left (causal)
        pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
        x = jnp.pad(
            x,
            ((0, 0), (pad_t, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
            mode="edge",
        )
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features),
            self.dtype,
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding="VALID", dimension_numbers=dn,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.dtype)
        return y + bias


class ResBlock3d(nn.Module):
    out_ch: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(8, dtype=self.dtype, name="norm1")(x)
        h = CausalConv3d(self.out_ch, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = GroupNorm(8, dtype=self.dtype, name="norm2")(h)
        h = CausalConv3d(self.out_ch, dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = CausalConv3d(self.out_ch, (1, 1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, x):  # [B, T, H, W, 3]
        cfg = self.cfg
        dt = cfg.dtype
        h = CausalConv3d(cfg.base_channels, dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(cfg.channel_multipliers):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block):
                h = ResBlock3d(ch, dt, name=f"down_{i}_block_{j}")(h)
            if i < len(cfg.channel_multipliers) - 1 or cfg.temporal_downscales[i]:
                st = 2 if cfg.temporal_downscales[i] else 1
                ss = 2 if i < len(cfg.channel_multipliers) - 1 else 1
                h = CausalConv3d(ch, (3, 3, 3), strides=(st, ss, ss), dtype=dt,
                                 name=f"down_{i}_downsample")(h)
        h = GroupNorm(8, dtype=dt, name="norm_out")(h)
        return CausalConv3d(2 * cfg.latent_channels, dtype=dt, name="conv_out")(nn.silu(h))


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z):  # [B, t, h, w, C]
        cfg = self.cfg
        dt = cfg.dtype
        h = CausalConv3d(cfg.base_channels * cfg.channel_multipliers[-1], dtype=dt, name="conv_in")(z)
        for i, mult in reversed(list(enumerate(cfg.channel_multipliers))):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock3d(ch, dt, name=f"up_{i}_block_{j}")(h)
            if i < len(cfg.channel_multipliers) - 1 or cfg.temporal_downscales[i]:
                b, tt, hh, ww, cc = h.shape
                ft = 2 if cfg.temporal_downscales[i] else 1
                fs = 2 if i < len(cfg.channel_multipliers) - 1 else 1
                h = jax.image.resize(h, (b, tt * ft, hh * fs, ww * fs, cc), "nearest")
                h = CausalConv3d(ch, dtype=dt, name=f"up_{i}_upsample")(h)
        h = GroupNorm(8, dtype=dt, name="norm_out")(h)
        return CausalConv3d(cfg.in_channels, dtype=dt, name="conv_out")(nn.silu(h))


class VideoAutoencoderKL(nn.Module):
    cfg: VideoVAEConfig

    def setup(self):
        self.encoder = VideoEncoder(self.cfg, name="encoder")
        self.decoder = VideoDecoder(self.cfg, name="decoder")

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.cfg.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z / self.cfg.scaling_factor)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
