"""KL autoencoder (the SD-family image VAE) in Flax, NHWC.

One configurable implementation covers SD1.x/2.x (4-ch latents, scale
0.18215), SDXL (0.13025) and FLUX (16-ch, scale 0.3611 / shift 0.1159) —
the reference reuses diffusers' AutoencoderKL for all of these
(``/root/reference/toolkit/models/base_model.py`` encode_images/decode_latents).
TPU notes: everything NHWC (conv layout native to XLA:TPU), GroupNorm in f32,
attention mid-block as a single fused dot-product attention.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv, GroupNorm, Linear


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 128
    channel_multipliers: tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    sample_size: int = 512
    # diffusers AutoencoderKL has 1x1 quant/post-quant convs (sd/sdxl: yes,
    # flux/BFL: no)
    use_quant_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        return cls(scaling_factor=0.13025)

    @classmethod
    def flux(cls) -> "VAEConfig":
        return cls(latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159,
                   use_quant_conv=False)

    @classmethod
    def sd3(cls) -> "VAEConfig":
        """SD3/SD3.5 16-ch VAE (diffusers vae/config.json: scaling_factor
        1.5305, shift_factor 0.0609, no quant convs)."""
        return cls(latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609,
                   use_quant_conv=False)

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        """CPU-testable config."""
        base = dict(base_channels=16, channel_multipliers=(1, 2), layers_per_block=1,
                    use_quant_conv=False, dtype=jnp.float32)
        base.update(kw)
        return cls(**base)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_multipliers) - 1)


class ResBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(32, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), dtype=self.dtype, param_dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(32, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), dtype=self.dtype, param_dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, (1, 1), dtype=self.dtype, param_dtype=self.dtype,
                     name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(32, dtype=self.dtype, name="norm")(x)
        y = y.reshape(b, h * w, c)
        q = Linear(c, dtype=self.dtype, param_dtype=self.dtype, name="q")(y)
        k = Linear(c, dtype=self.dtype, param_dtype=self.dtype, name="k")(y)
        v = Linear(c, dtype=self.dtype, param_dtype=self.dtype, name="v")(y)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = Linear(c, dtype=self.dtype, param_dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        h = Conv(cfg.base_channels, (3, 3), dtype=dt, param_dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(cfg.channel_multipliers):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block):
                h = ResBlock(ch, dt, name=f"down_{i}_block_{j}")(h)
            if i < len(cfg.channel_multipliers) - 1:
                # stride-2 conv with (0,1) asymmetric padding (SD convention)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = Conv(ch, (3, 3), strides=(2, 2), padding="VALID", dtype=dt, param_dtype=dt,
                         name=f"down_{i}_downsample")(h)
        mid_ch = cfg.base_channels * cfg.channel_multipliers[-1]
        h = ResBlock(mid_ch, dt, name="mid_block_1")(h)
        h = AttnBlock(dt, name="mid_attn")(h)
        h = ResBlock(mid_ch, dt, name="mid_block_2")(h)
        h = GroupNorm(32, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        return Conv(2 * cfg.latent_channels, (3, 3), dtype=dt, param_dtype=dt, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.dtype
        mid_ch = cfg.base_channels * cfg.channel_multipliers[-1]
        h = Conv(mid_ch, (3, 3), dtype=dt, param_dtype=dt, name="conv_in")(z)
        h = ResBlock(mid_ch, dt, name="mid_block_1")(h)
        h = AttnBlock(dt, name="mid_attn")(h)
        h = ResBlock(mid_ch, dt, name="mid_block_2")(h)
        for i, mult in reversed(list(enumerate(cfg.channel_multipliers))):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock(ch, dt, name=f"up_{i}_block_{j}")(h)
            if i > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = Conv(ch, (3, 3), dtype=dt, param_dtype=dt, name=f"up_{i}_upsample")(h)
        h = GroupNorm(32, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        return Conv(cfg.in_channels, (3, 3), dtype=dt, param_dtype=dt, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        if self.cfg.use_quant_conv:
            dt = self.cfg.dtype
            self.quant_conv = Conv(2 * self.cfg.latent_channels, (1, 1), dtype=dt,
                                   param_dtype=dt, name="quant_conv")
            self.post_quant_conv = Conv(self.cfg.latent_channels, (1, 1), dtype=dt,
                                        param_dtype=dt, name="post_quant_conv")

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """[B,H,W,3] image in [-1,1] -> [B,h,w,2C] (mean | logvar)."""
        m = self.encoder(x)
        if self.cfg.use_quant_conv:
            m = self.quant_conv(m)
        return m

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """Image -> scaled latent (mode if rng is None, else a sample)."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        """Scaled latent -> image in [-1,1]."""
        z = z / self.cfg.scaling_factor + self.cfg.shift_factor
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
