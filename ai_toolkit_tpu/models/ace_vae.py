"""Exact ACE-Step Oobleck audio VAE (weight-norm folded at import).

Parity target: ``OobleckVAE`` in the reference's vendored AIO model
(``/root/reference/extensions_built_in/audio_models/ace_step/src/model.py:
974-1146``): SnakeBeta activations, dilated ResUnits (1/3/9), stride
(2,4,4,6,10) enc/dec ladders over channel mults (1,2,4,8,16), mean-only
bottleneck (chunk(2) -> mean). 48kHz stereo -> latent 64ch at rate/1920.

Channels-last [B, L, C]; torch's weight-norm parametrization is folded into
plain kernels by ``io/ace_import.py`` (the VAE is frozen in every ACE
training flow). Decode supports the reference's tiled crossfade for long
clips host-side (``tiled_decode``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class OobleckConfig:
    in_ch: int = 2
    channels: int = 128
    latent_dim: int = 64
    c_mults: tuple = (1, 2, 4, 8, 16)
    strides: tuple = (2, 4, 4, 6, 10)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def upscale_factor(self) -> int:
        return int(np.prod(self.strides))

    @classmethod
    def ace15(cls) -> "OobleckConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "OobleckConfig":
        return cls(channels=8, latent_dim=4, c_mults=(1, 2), strides=(2, 4))


def _conv1d(x, kernel, bias=None, stride=1, padding=0, dilation=1):
    """x [B, L, C]; kernel [k, Cin, Cout] (WIO)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + bias
    return y


def _conv1d_transpose(x, kernel, bias=None, stride=1, padding=0):
    """torch ConvTranspose1d semantics: out = (L-1)*s + k - 2p.
    kernel here is ALREADY in WIO layout for the equivalent forward conv
    (flipped + in/out swapped by the importer)."""
    k = kernel.shape[0]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + bias
    return y


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    transpose: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, x.shape[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        if self.transpose:
            return _conv1d_transpose(x, kern, bias, self.stride, self.padding)
        return _conv1d(x, kern, bias, self.stride, self.padding, self.dilation)


class SnakeBeta(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.zeros_init(), (self.channels,), jnp.float32)
        b = self.param("beta", nn.initializers.zeros_init(), (self.channels,), jnp.float32)
        ae = jnp.exp(a)
        be = jnp.exp(b)
        xf = x.astype(jnp.float32)
        return (xf + (1.0 / (be + 1e-9)) * jnp.square(jnp.sin(xf * ae))).astype(x.dtype)


class ResUnit(nn.Module):
    ch: int
    dilation: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SnakeBeta(self.ch, name="snake_0")(x)
        h = _Conv(self.ch, 7, padding=(self.dilation * 6) // 2,
                  dilation=self.dilation, param_dtype=self.param_dtype,
                  name="conv_0")(h)
        h = SnakeBeta(self.ch, name="snake_1")(h)
        h = _Conv(self.ch, 1, param_dtype=self.param_dtype, name="conv_1")(h)
        return x + h


class EncBlock(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 3, 9)):
            x = ResUnit(self.in_ch, d, self.param_dtype, name=f"res_{i}")(x)
        x = SnakeBeta(self.in_ch, name="snake")(x)
        return _Conv(self.out_ch, 2 * self.stride, stride=self.stride,
                     padding=math.ceil(self.stride / 2),
                     param_dtype=self.param_dtype, name="down")(x)


class DecBlock(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SnakeBeta(self.in_ch, name="snake")(x)
        x = _Conv(self.out_ch, 2 * self.stride, stride=self.stride,
                  padding=math.ceil(self.stride / 2), transpose=True,
                  param_dtype=self.param_dtype, name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResUnit(self.out_ch, d, self.param_dtype, name=f"res_{i}")(x)
        return x


class AceOobleckVAE(nn.Module):
    cfg: OobleckConfig

    def setup(self):
        cfg = self.cfg
        cm = [1] + list(cfg.c_mults)
        self.enc_in = _Conv(cm[0] * cfg.channels, 7, padding=3,
                            param_dtype=cfg.param_dtype)
        self.enc_blocks = [
            EncBlock(cm[i] * cfg.channels, cm[i + 1] * cfg.channels,
                     cfg.strides[i], cfg.param_dtype, name=f"enc_{i}")
            for i in range(len(cm) - 1)
        ]
        self.enc_snake = SnakeBeta(cm[-1] * cfg.channels)
        self.enc_out = _Conv(cfg.latent_dim * 2, 3, padding=1,
                             param_dtype=cfg.param_dtype)
        self.dec_in = _Conv(cm[-1] * cfg.channels, 7, padding=3,
                            param_dtype=cfg.param_dtype)
        self.dec_blocks = [
            DecBlock(cm[i] * cfg.channels, cm[i - 1] * cfg.channels,
                     cfg.strides[i - 1], cfg.param_dtype, name=f"dec_{j}")
            for j, i in enumerate(range(len(cm) - 1, 0, -1))
        ]
        self.dec_snake = SnakeBeta(cm[0] * cfg.channels)
        self.dec_out = _Conv(cfg.in_ch, 7, padding=3, use_bias=False,
                             param_dtype=cfg.param_dtype)

    def __call__(self, x):  # encode-decode roundtrip (init convenience)
        return self.decode(self.encode(x))

    def encode(self, x):
        """waveform [B, L, in_ch] -> latents [B, L/prod(strides), latent_dim]."""
        h = self.enc_in(x)
        for blk in self.enc_blocks:
            h = blk(h)
        h = self.enc_out(self.enc_snake(h))
        mean, _scale = jnp.split(h, 2, axis=-1)  # bottleneck keeps the mean
        return mean

    def decode(self, z):
        h = self.dec_in(z)
        for blk in self.dec_blocks:
            h = blk(h)
        return self.dec_out(self.dec_snake(h))
