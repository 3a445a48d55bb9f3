"""LTX-2 vocoder (diffusers ``LTX2Vocoder``): HiFi-GAN-family mel -> waveform.

Config from the reference converter (``convert_ltx2_to_diffusers.py:777+``,
version 2.0): in 128 (stereo mel stacked), hidden 1024, out 2 (stereo wav),
upsample kernels [16,15,8,4,4] / factors [6,5,2,2,2] (x240: 16 kHz mel hop 160
-> 24 kHz audio), 3 resnet kernels [3,7,11] with dilations [1,3,5],
leaky_relu(0.1), tanh head. Key names after the converter rename:
``conv_in`` (conv_pre), ``upsamplers.N`` (ups, ConvTranspose1d),
``resnets.N`` (resblocks, flat: 3 per level, ``convs1/convs2`` inside),
``conv_out`` (conv_post). The 2.3 snakebeta/BWE variant is not implemented.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


@dataclass(frozen=True)
class VocoderConfig:
    in_channels: int = 128
    hidden_channels: int = 1024
    out_channels: int = 2
    upsample_kernel_sizes: tuple[int, ...] = (16, 15, 8, 4, 4)
    upsample_factors: tuple[int, ...] = (6, 5, 2, 2, 2)
    resnet_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resnet_dilations: tuple[int, ...] = (1, 3, 5)
    leaky_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def ltx2(cls) -> "VocoderConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VocoderConfig":
        return cls(in_channels=8, hidden_channels=16, upsample_kernel_sizes=(4, 4),
                   upsample_factors=(2, 2), resnet_kernel_sizes=(3,),
                   resnet_dilations=(1, 3))

    @property
    def total_upsample(self) -> int:
        out = 1
        for f in self.upsample_factors:
            out *= f
        return out


class Conv1d(nn.Module):
    """torch-Conv1d-compatible 1D conv on [B, T, C], symmetric padding."""

    features: int
    kernel: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) * self.dilation // 2
        return nn.Conv(self.features, (self.kernel,), padding=[(pad, pad)],
                       kernel_dilation=(self.dilation,), dtype=self.dtype,
                       name="conv")(x)


class ConvTranspose1d(nn.Module):
    """torch-ConvTranspose1d equivalent on [B, T, C]: out length =
    (T-1)*stride - 2*pad + kernel with pad = (kernel - stride) // 2
    (the HiFi-GAN convention)."""

    features: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        p = (k - s) // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        # torch convtranspose == conv_transpose with per-side pad (k-1-p);
        # kernel [k, in, out] under "HOI" + transpose_kernel (verified vs torch)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype), strides=(s,),
            padding=[(k - 1 - p, k - 1 - p)],
            dimension_numbers=("NHC", "HOI", "NHC"), transpose_kernel=True,
        )
        return y + bias.astype(self.dtype)


class VocoderResBlock(nn.Module):
    ch: int
    kernel: int
    dilations: tuple[int, ...]
    slope: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, self.slope)
            h = Conv1d(self.ch, self.kernel, dilation=d, dtype=self.dtype,
                       name=f"convs1_{j}")(h)
            h = nn.leaky_relu(h, self.slope)
            h = Conv1d(self.ch, self.kernel, dilation=1, dtype=self.dtype,
                       name=f"convs2_{j}")(h)
            x = x + h
        return x


class LTX2Vocoder(nn.Module):
    cfg: VocoderConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: [B, T, in_channels] -> waveform [B, T*total_upsample, out]."""
        cfg = self.cfg
        x = Conv1d(cfg.hidden_channels, 7, dtype=cfg.dtype, name="conv_in")(mel)
        ch = cfg.hidden_channels
        nk = len(cfg.resnet_kernel_sizes)
        for i, (k, u) in enumerate(zip(cfg.upsample_kernel_sizes, cfg.upsample_factors)):
            x = nn.leaky_relu(x, cfg.leaky_slope)
            ch = ch // 2
            x = ConvTranspose1d(ch, k, u, dtype=cfg.dtype, name=f"upsamplers_{i}")(x)
            acc = None
            for j, rk in enumerate(cfg.resnet_kernel_sizes):
                y = VocoderResBlock(ch, rk, cfg.resnet_dilations, cfg.leaky_slope,
                                    cfg.dtype, name=f"resnets_{nk * i + j}")(x)
                acc = y if acc is None else acc + y
            x = acc / nk
        x = nn.leaky_relu(x, cfg.leaky_slope)
        x = Conv1d(cfg.out_channels, 7, dtype=cfg.dtype, name="conv_out")(x)
        return jnp.tanh(x)


def vocoder_rules():
    """diffusers LTX2Vocoder keys -> our tree (conv1d kind: [o,i,k]->[k,i,o])."""
    from ai_toolkit_tpu.io.torch_import import Rule  # noqa: F401

    return [
        (r"conv_in\.weight", "conv_in/conv/kernel", "conv1d"),
        (r"conv_in\.bias", "conv_in/conv/bias", "direct"),
        (r"conv_out\.weight", "conv_out/conv/kernel", "conv1d"),
        (r"conv_out\.bias", "conv_out/conv/bias", "direct"),
        # torch ConvTranspose1d weight [in, out, k] -> ours [k, in, out]
        (r"upsamplers\.(\d+)\.weight", "upsamplers_{0}/kernel", "convtranspose1d"),
        (r"upsamplers\.(\d+)\.bias", "upsamplers_{0}/bias", "direct"),
        (r"resnets\.(\d+)\.convs1\.(\d+)\.weight", "resnets_{0}/convs1_{1}/conv/kernel", "conv1d"),
        (r"resnets\.(\d+)\.convs1\.(\d+)\.bias", "resnets_{0}/convs1_{1}/conv/bias", "direct"),
        (r"resnets\.(\d+)\.convs2\.(\d+)\.weight", "resnets_{0}/convs2_{1}/conv/kernel", "conv1d"),
        (r"resnets\.(\d+)\.convs2\.(\d+)\.bias", "resnets_{0}/convs2_{1}/conv/bias", "direct"),
    ]


def stack_stereo_mel(mel: jax.Array) -> jax.Array:
    """[B, T, n_mels, 2] -> [B, T, 2*n_mels] vocoder input (left block then
    right block; the in_channels=128 = 2x64 stacking convention)."""
    b, t, m, c = mel.shape
    return mel.transpose(0, 1, 3, 2).reshape(b, t, c * m)
