"""Pixtral vision encoder (exact port of the reference's vendored tower).

Reference: ``/root/reference/toolkit/models/pixtral_vision.py`` —
``PixtralVisionEncoder`` (:229-356): 16x16 patch conv (no bias) -> RMSNorm
``ln_pre`` (eps 1e-5) -> N llama-style blocks (RMSNorm -> MHA with
interleaved-complex 2D RoPE -> RMSNorm -> SwiGLU), no final norm. The
reference packs variable-size images into one block-diagonal sequence
(xformers BlockDiagonalMask); on TPU we batch same-size images, which is
numerically identical per image (the block mask forbids cross-image
attention anyway).

RoPE semantics (:182-207): base freqs ``1/theta^(2i/dim)``; height angles
use the EVEN freq rows, width angles the ODD rows, concatenated to dim/2
angles per (h, w) cell; rotation acts on interleaved (x0,x1)(x2,x3)...
pairs (torch ``view_as_complex`` on reshape(-1, 2)).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm

# reference pixtral_vision.py:401-402 (CLIP statistics)
PIXTRAL_MEAN = (0.48145466, 0.4578275, 0.40821073)
PIXTRAL_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class PixtralVisionConfig:
    hidden_size: int = 1024
    image_size: int = 1024
    patch_size: int = 16
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    rope_theta: float = 1e4
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny(cls) -> "PixtralVisionConfig":
        return cls(hidden_size=64, image_size=64, patch_size=16,
                   intermediate_size=128, num_hidden_layers=2,
                   num_attention_heads=4)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def pixtral_rope_angles(cfg: PixtralVisionConfig, gh: int, gw: int) -> np.ndarray:
    """[gh*gw, head_dim/2] rope angles (precompute_freqs_cis_2d :182-207)."""
    dim = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    h = np.arange(gh, dtype=np.float64)
    w = np.arange(gw, dtype=np.float64)
    freqs_h = np.outer(h, freqs[::2])  # [gh, dim/4]
    freqs_w = np.outer(w, freqs[1::2])  # [gw, dim/4 (or one less if odd)]
    two_d = np.concatenate(
        [
            np.repeat(freqs_h[:, None, :], gw, axis=1),
            np.repeat(freqs_w[None, :, :], gh, axis=0),
        ],
        axis=-1,
    )  # [gh, gw, dim/2]
    return two_d.reshape(gh * gw, -1).astype(np.float32)


def _rope_interleaved(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate interleaved pairs: x [B, S, H, D], angles [S, D/2]."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    re = x2[..., 0] * cos - x2[..., 1] * sin
    im = x2[..., 0] * sin + x2[..., 1] * cos
    return jnp.stack([re, im], axis=-1).reshape(xf.shape).astype(x.dtype)


class _Block(nn.Module):
    cfg: PixtralVisionConfig

    @nn.compact
    def __call__(self, x, angles):
        cfg = self.cfg
        dt = cfg.dtype
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        b, s, _ = x.shape
        xn = RMSNorm(cfg.hidden_size, dtype=dt, eps=1e-5,
                     name="attention_norm")(x)
        q = Linear(nh * hd, use_bias=False, dtype=dt, param_dtype=dt, name="wq")(xn)
        k = Linear(nh * hd, use_bias=False, dtype=dt, param_dtype=dt, name="wk")(xn)
        v = Linear(nh * hd, use_bias=False, dtype=dt, param_dtype=dt, name="wv")(xn)
        q = _rope_interleaved(q.reshape(b, s, nh, hd), angles)
        k = _rope_interleaved(k.reshape(b, s, nh, hd), angles)
        attn = dot_product_attention(q, k, v.reshape(b, s, nh, hd))
        x = x + Linear(cfg.hidden_size, use_bias=False, dtype=dt,
                       param_dtype=dt, name="wo")(attn.reshape(b, s, nh * hd))
        xn = RMSNorm(cfg.hidden_size, dtype=dt, eps=1e-5, name="ffn_norm")(x)
        g = Linear(cfg.intermediate_size, use_bias=False, dtype=dt,
                   param_dtype=dt, name="w1")(xn)
        u = Linear(cfg.intermediate_size, use_bias=False, dtype=dt,
                   param_dtype=dt, name="w3")(xn)
        return x + Linear(cfg.hidden_size, use_bias=False, dtype=dt,
                          param_dtype=dt, name="w2")(jax.nn.silu(g) * u)


class PixtralVisionEncoder(nn.Module):
    """images [B, H, W, 3] (pre-normalized) -> tokens [B, gh*gw, hidden]."""

    cfg: PixtralVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), use_bias=False,
                    dtype=cfg.dtype, param_dtype=cfg.dtype,
                    name="patch_conv")(images.astype(cfg.dtype))
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        x = RMSNorm(cfg.hidden_size, dtype=cfg.dtype, eps=1e-5, name="ln_pre")(x)
        angles = jnp.asarray(pixtral_rope_angles(cfg, gh, gw))
        for i in range(cfg.num_hidden_layers):
            x = _Block(cfg, name=f"layer_{i}")(x, angles)
        return x


def pixtral_encoder_tree(flat: dict[str, np.ndarray], cfg: PixtralVisionConfig) -> dict:
    """torch state dict (reference key layout ``patch_conv.weight`` /
    ``transformer.layers.{i}.attention.wq.weight`` ...) -> flax param tree."""
    tree: dict = {}
    tree["patch_conv"] = {
        # OIHW -> HWIO
        "kernel": np.ascontiguousarray(
            np.asarray(flat["patch_conv.weight"], np.float32).transpose(2, 3, 1, 0))
    }
    tree["ln_pre"] = {"scale": np.asarray(flat["ln_pre.weight"], np.float32)}
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.layers.{i}."
        layer: dict = {
            "attention_norm": {
                "scale": np.asarray(flat[pre + "attention_norm.weight"], np.float32)},
            "ffn_norm": {
                "scale": np.asarray(flat[pre + "ffn_norm.weight"], np.float32)},
        }
        for dst, src in (("wq", "attention.wq"), ("wk", "attention.wk"),
                         ("wv", "attention.wv"), ("wo", "attention.wo"),
                         ("w1", "feed_forward.w1"), ("w2", "feed_forward.w2"),
                         ("w3", "feed_forward.w3")):
            layer[dst] = {"kernel": np.ascontiguousarray(
                np.asarray(flat[pre + src + ".weight"], np.float32).T)}
        tree[f"layer_{i}"] = layer
    return tree


def load_pixtral_encoder(path: str):
    """Local pixtral dir (config.json + model.safetensors, reference
    from_pretrained :271-294) -> (module, params)."""
    import json
    import os

    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    cfg = PixtralVisionConfig(
        hidden_size=int(raw.get("hidden_size", 1024)),
        image_size=int(raw.get("image_size", 1024)),
        patch_size=int(raw.get("patch_size", 16)),
        intermediate_size=int(raw.get("intermediate_size", 4096)),
        num_hidden_layers=int(raw.get("num_hidden_layers", 24)),
        num_attention_heads=int(raw.get("num_attention_heads", 16)),
        rope_theta=float(raw.get("rope_theta", 1e4)),
    )
    flat = {}
    with safe_open(os.path.join(path, "model.safetensors"), "np") as f:
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    return PixtralVisionEncoder(cfg), pixtral_encoder_tree(flat, cfg)
