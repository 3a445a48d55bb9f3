"""T2I-Adapter / ControlNet-style assistant adapter.

Parity target: the reference's "assistant adapter" conditioning
(``adapter_assist_name_or_path``, train_config.py:420-421; usage
``SDTrainer.py:1403-1498``): a lightweight control net consumes the control
image and injects per-resolution residual features into the UNet down path —
either FROZEN (assist mode, guiding LoRA training) or TRAINABLE (training a
new control adapter, reference ``t2i`` adapter type).

Architecture follows the T2I-Adapter recipe: pixel-unshuffle the control
image to latent resolution, then per-level [conv -> resblocks -> downsample]
producing one feature map per UNet down level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv


class _AdapterResBlock(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = Conv(self.ch, (3, 3), dtype=self.dtype, param_dtype=self.dtype, name="conv1")(x)
        h = nn.silu(h)
        h = Conv(self.ch, (3, 3), dtype=self.dtype, param_dtype=self.dtype, name="conv2")(h)
        return x + h


class T2IAdapterNet(nn.Module):
    """control image [B, H, W, 3] -> tuple of per-level features matching the
    UNet down path resolutions/channels."""

    channels: tuple[int, ...]  # UNet block_out_channels
    downscale: int = 8  # pixel -> latent factor (VAE downscale)
    num_res_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, control: jax.Array) -> tuple[jax.Array, ...]:
        d = self.downscale
        b, h, w, c = control.shape
        # pixel-unshuffle to latent resolution
        x = control.reshape(b, h // d, d, w // d, d, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // d, w // d, d * d * c)
        x = Conv(self.channels[0], (3, 3), dtype=self.dtype, param_dtype=self.dtype,
                 name="conv_in")(x.astype(self.dtype))
        feats = []
        for i, ch in enumerate(self.channels):
            if i > 0:
                x = Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype, param_dtype=self.dtype,
                         name=f"down_{i}")(x)
            else:
                x = Conv(ch, (3, 3), dtype=self.dtype, param_dtype=self.dtype, name="proj_0")(x)
            for j in range(self.num_res_blocks):
                x = _AdapterResBlock(ch, self.dtype, name=f"level_{i}_res_{j}")(x)
            feats.append(x)
        return tuple(feats)


def init_t2i_adapter(unet_config, rng: jax.Array, image_size: int = 64, downscale: int = 8):
    net = T2IAdapterNet(
        channels=tuple(unet_config.block_out_channels),
        downscale=downscale,
        dtype=jnp.float32,
    )
    params = net.init(rng, jnp.zeros((1, image_size, image_size, 3)))["params"]
    return net, params
