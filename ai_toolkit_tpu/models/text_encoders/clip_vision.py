"""CLIP vision tower (ViT) — image conditioning for IP-Adapter / i2v.

Covers the role of transformers' CLIPVisionModel in the reference's adapter
stack (``/root/reference/toolkit/clip_vision_adapter.py``,
``ip_adapter.py``): patchify conv, CLS token, learned positions, pre-LN ViT
layers, pooled (CLS) output + penultimate hidden states.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.models.text_encoders.clip import CLIPLayer, CLIPTextConfig
from ai_toolkit_tpu.ops.layers import Conv, LayerNorm, Linear


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def vit_l(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def vit_h(cls) -> "CLIPVisionConfig":
        return cls(hidden_size=1280, num_layers=32, num_heads=16, intermediate_size=5120,
                   projection_dim=1024)

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
                   intermediate_size=128, projection_dim=64, dtype=jnp.float32)


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> dict[str, jax.Array]:
        """pixels: [B, H, W, 3] normalized. Returns pooled + hidden states."""
        cfg = self.cfg
        dt = cfg.dtype
        # reuse the text-layer block with a config view carrying vision dims
        layer_cfg = CLIPTextConfig(
            hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size, hidden_act="quick_gelu", dtype=dt,
        )
        b = pixels.shape[0]
        x = Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                 strides=(cfg.patch_size, cfg.patch_size), padding="VALID", use_bias=False,
                 dtype=dt, param_dtype=dt, name="patch_embedding")(pixels.astype(dt))
        x = x.reshape(b, -1, cfg.hidden_size)
        n = x.shape[1]
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,),
                         jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(dt)[None, None], (b, 1, 1)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(dt)
        x = LayerNorm(eps=1e-5, dtype=dt, name="pre_ln")(x)
        hidden = []
        for i in range(cfg.num_layers):
            x = CLIPLayer(layer_cfg, name=f"layer_{i}")(x, mask=jnp.ones((b, 1, x.shape[1], x.shape[1]), bool))
            hidden.append(x)
        # HF semantics: last_hidden_state is the raw encoder output; the post
        # layernorm is applied only on the CLS token for pooling/projection
        post_cls = LayerNorm(eps=1e-5, dtype=dt, name="post_ln")(x[:, 0])
        pooled = Linear(cfg.projection_dim, use_bias=False, dtype=dt, param_dtype=dt,
                        name="visual_projection")(post_cls)
        return {
            "pooled_output": pooled,
            "last_hidden_state": x,
            "penultimate_hidden_state": hidden[-2] if cfg.num_layers > 1 else x,
        }
