"""RRDB / ESRGAN upscaler network (reference ``toolkit/models/RRDB.py``).

Residual-in-Residual Dense Blocks + pixel upsampling, NHWC Flax.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv


@dataclass(frozen=True)
class RRDBConfig:
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 64
    growth_channels: int = 32
    num_blocks: int = 23
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def esrgan_4x(cls) -> "RRDBConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "RRDBConfig":
        return cls(base_channels=16, growth_channels=8, num_blocks=2, scale=2)


class DenseBlock(nn.Module):
    cfg: RRDBConfig

    @nn.compact
    def __call__(self, x):
        c, g, dt = self.cfg.base_channels, self.cfg.growth_channels, self.cfg.dtype
        feats = [x]
        for i in range(4):
            h = Conv(g, (3, 3), dtype=dt, param_dtype=dt, name=f"conv{i+1}")(
                jnp.concatenate(feats, axis=-1)
            )
            feats.append(nn.leaky_relu(h, 0.2))
        out = Conv(c, (3, 3), dtype=dt, param_dtype=dt, name="conv5")(
            jnp.concatenate(feats, axis=-1)
        )
        return x + 0.2 * out


class RRDBBlock(nn.Module):
    cfg: RRDBConfig

    @nn.compact
    def __call__(self, x):
        h = DenseBlock(self.cfg, name="db1")(x)
        h = DenseBlock(self.cfg, name="db2")(h)
        h = DenseBlock(self.cfg, name="db3")(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    cfg: RRDBConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [-1, 1]
        cfg = self.cfg
        dt = cfg.dtype
        fea = Conv(cfg.base_channels, (3, 3), dtype=dt, param_dtype=dt, name="conv_first")(x)
        h = fea
        for i in range(cfg.num_blocks):
            h = RRDBBlock(cfg, name=f"rrdb_{i}")(h)
        h = Conv(cfg.base_channels, (3, 3), dtype=dt, param_dtype=dt, name="trunk_conv")(h)
        fea = fea + h
        ups = 1
        while ups < cfg.scale:
            b, hh, ww, cc = fea.shape
            fea = jax.image.resize(fea, (b, hh * 2, ww * 2, cc), "nearest")
            fea = nn.leaky_relu(
                Conv(cfg.base_channels, (3, 3), dtype=dt, param_dtype=dt, name=f"up_{ups}")(fea),
                0.2,
            )
            ups *= 2
        fea = nn.leaky_relu(
            Conv(cfg.base_channels, (3, 3), dtype=dt, param_dtype=dt, name="hr_conv")(fea), 0.2
        )
        return Conv(cfg.out_channels, (3, 3), dtype=dt, param_dtype=dt, name="conv_last")(fea)
