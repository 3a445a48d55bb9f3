"""Sapiens2 ViT + matting head (human foreground matting).

Exact TPU reimplementation of the reference's vendored standalone Sapiens2
(``/root/reference/toolkit/models/sapiens2.py``, itself vendored from
facebookresearch/sapiens2): rope position embedding with a learned-buffer
period table computed in bf16 (:34-152), cls + storage tokens (:604-620),
an MHSA/GQA layer pattern (first/last 8 layers MHSA, middle layers GQA with
kv_heads = heads/2, :641-648), per-head qk RMSNorm (:303-305), LayerScale on
the attention branch (:312-315), SwiGLU FFN (:885-930), a final RMSNorm, and
the conv + pixel-shuffle MattingHead (4-ch premultiplied foreground + alpha,
sigmoid output, :950-1007).

Used by the ``sapiens2_mask`` control type (reference
control_generator.py:225-236, config_modules.py:909). Weights load from a
local safetensors file (the reference hub-downloads
``facebook/sapiens2-matting-1b``; this environment has no egress) via
``import_sapiens2_matting``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class Sapiens2Config:
    embed_dim: int = 1536
    num_layers: int = 40
    num_heads: int = 24
    ffn_dim: int = 6144
    patch_size: int = 16
    n_storage_tokens: int = 8
    # first `mhsa_early` and last `mhsa_late` layers use full MHSA; everything
    # between uses GQA with kv_heads = num_heads // 2 (reference :641-648)
    mhsa_early: int = 8
    mhsa_late: int = 8
    # explicit per-layer kv-head override (shape-driven checkpoint import);
    # None -> the early/late MHSA pattern above
    kv_pattern: tuple | None = None
    rope_base: float = 100.0
    layer_scale_init: float = 1e-4
    head_channels: tuple = (768, 512, 256, 128)
    head_conv_channels: tuple = (64, 32, 16)
    dtype: object = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def kv_heads(self, layer: int) -> int:
        if self.kv_pattern is not None:
            return self.kv_pattern[layer]
        if layer < self.mhsa_early or layer >= self.num_layers - self.mhsa_late:
            return self.num_heads
        return self.num_heads // 2

    # reference arch_zoo (:448-499)
    _ZOO = {
        "sapiens2_0.1b": (768, 12, 12),
        "sapiens2_0.4b": (1024, 24, 16),
        "sapiens2_0.8b": (1280, 32, 16),
        "sapiens2_1b": (1536, 40, 24),
        "sapiens2_5b": (2432, 56, 32),
    }

    @classmethod
    def arch(cls, name: str) -> "Sapiens2Config":
        d, layers, heads = cls._ZOO[name.lower()]
        return cls(embed_dim=d, num_layers=layers, num_heads=heads, ffn_dim=4 * d)

    @classmethod
    def tiny(cls) -> "Sapiens2Config":
        return cls(embed_dim=64, num_layers=4, num_heads=4, ffn_dim=128,
                   n_storage_tokens=2, mhsa_early=1, mhsa_late=1,
                   head_channels=(32, 16, 8, 8), head_conv_channels=(8, 8, 8))


def rope_periods(head_dim: int, base: float = 100.0) -> np.ndarray:
    """Initial period table (reference _init_weights, :133-152) — stored as a
    persistent buffer in checkpoints, so it is a param here (bf16)."""
    d4 = head_dim // 4
    per = base ** (2 * np.arange(d4, dtype=np.float32) / (head_dim // 2))
    return per.astype(jnp.bfloat16)


def rope_sincos(periods: jax.Array, h: int, w: int) -> tuple[jax.Array, jax.Array]:
    """(sin, cos) [HW, head_dim], computed in bf16 like the reference
    (pos_embed_rope_dtype='bf16', :579; coords 'separate'-normalized :88-93)."""
    bf = jnp.bfloat16
    ch = (jnp.arange(h, dtype=bf) + bf(0.5)) / bf(h)
    cw = (jnp.arange(w, dtype=bf) + bf(0.5)) / bf(w)
    coords = jnp.stack(jnp.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    coords = 2.0 * coords - 1.0
    ang = 2.0 * np.pi * coords[:, :, None] / periods.astype(bf)[None, None, :]
    ang = ang.reshape(ang.shape[0], -1)  # [HW, D/2]
    ang = jnp.tile(ang, (1, 2))  # [HW, D]
    return jnp.sin(ang), jnp.cos(ang)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class GroupedQueryAttention(nn.Module):
    """Reference GroupedQueryAttention (:255-396): separate wq/wk/wv, per-head
    qk RMSNorm, kv repeat, rope applied after qk-norm skipping the prefix
    (cls+storage) tokens, sdpa, proj, LayerScale gamma."""

    cfg: Sapiens2Config
    kv_heads: int

    @nn.compact
    def __call__(self, x, sin, cos, n_prefix: int):
        c = self.cfg
        b, n, _ = x.shape
        hd = c.head_dim
        q = nn.Dense(c.embed_dim, dtype=c.dtype, name="wq")(x)
        k = nn.Dense(self.kv_heads * hd, dtype=c.dtype, name="wk")(x)
        v = nn.Dense(self.kv_heads * hd, dtype=c.dtype, name="wv")(x)
        q = q.reshape(b, n, c.num_heads, hd)
        k = k.reshape(b, n, self.kv_heads, hd)
        v = v.reshape(b, n, self.kv_heads, hd)
        q = nn.RMSNorm(epsilon=1e-6, dtype=c.dtype, name="q_norm")(q)
        k = nn.RMSNorm(epsilon=1e-6, dtype=c.dtype, name="k_norm")(k)
        if self.kv_heads != c.num_heads:
            rep = c.num_heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        def rope(t):
            # rope math runs in bf16 and casts back (reference apply_rope)
            body = t[:, n_prefix:].astype(sin.dtype)
            s, co = sin[None, :, None, :], cos[None, :, None, :]
            body = body * co + _rotate_half(body) * s
            return jnp.concatenate([t[:, :n_prefix], body.astype(t.dtype)], axis=1)

        q, k = rope(q), rope(k)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c.embed_dim)
        out = nn.Dense(c.embed_dim, dtype=c.dtype, name="proj")(out)
        gamma = self.param(
            "gamma", lambda _: jnp.full((c.embed_dim,), c.layer_scale_init, jnp.float32)
        )
        return out * gamma.astype(out.dtype)


class SwiGLUFFN(nn.Module):
    """Reference SwiGLUFFN (:885-930): w12 -> chunk -> silu(x1)*x2 -> w3, with
    the identity added inside (add_identity)."""

    cfg: Sapiens2Config

    @nn.compact
    def __call__(self, x, identity):
        c = self.cfg
        x12 = nn.Dense(2 * c.ffn_dim, dtype=c.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        out = nn.Dense(c.embed_dim, dtype=c.dtype, name="w3")(nn.silu(x1) * x2)
        return identity + out


class Sapiens2Block(nn.Module):
    cfg: Sapiens2Config
    kv_heads: int

    @nn.compact
    def __call__(self, x, sin, cos, n_prefix):
        c = self.cfg
        h = nn.RMSNorm(epsilon=1e-6, dtype=c.dtype, name="ln1")(x)
        x = x + GroupedQueryAttention(c, self.kv_heads, name="attn")(h, sin, cos, n_prefix)
        h = nn.RMSNorm(epsilon=1e-6, dtype=c.dtype, name="ln2")(x)
        return SwiGLUFFN(c, name="ffn")(h, identity=x)


class Sapiens2Backbone(nn.Module):
    """Reference Sapiens2 (:447-797) with out_type='featmap': returns patch
    tokens as an NHWC feature map after the final RMSNorm."""

    cfg: Sapiens2Config

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3]
        c = self.cfg
        p = c.patch_size
        b = x.shape[0]
        gh, gw = x.shape[1] // p, x.shape[2] // p
        x = nn.Conv(
            c.embed_dim, (p, p), strides=(p, p), padding="VALID", dtype=c.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim))
        sto = self.param(
            "storage_tokens", nn.initializers.zeros, (1, c.n_storage_tokens, c.embed_dim)
        )
        n_prefix = 1 + c.n_storage_tokens
        x = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)).astype(x.dtype),
             jnp.tile(sto, (b, 1, 1)).astype(x.dtype), x], axis=1,
        )
        periods = self.param(
            "rope_periods", lambda _: rope_periods(c.head_dim, c.rope_base)
        )
        sin, cos = rope_sincos(periods, gh, gw)
        for i in range(c.num_layers):
            x = Sapiens2Block(c, c.kv_heads(i), name=f"blocks_{i}")(x, sin, cos, n_prefix)
        x = nn.RMSNorm(epsilon=1e-6, dtype=c.dtype, name="ln1")(x)
        return x[:, n_prefix:].reshape(b, gh, gw, c.embed_dim)


def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d default: affine-free, per-sample per-channel
    normalization over the spatial dims."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def _pixel_shuffle(x: jax.Array, f: int = 2) -> jax.Array:
    """NHWC depth-to-space matching torch.nn.PixelShuffle channel order."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * f, w * f, c)


class MattingHead(nn.Module):
    """Reference MattingHead (:950-1007): input conv, 4 pixel-shuffle
    upsample blocks (16x total, inverting the patch embed), 3 refinement
    convs, 1x1 matting conv -> sigmoid. Channels 0-2 = premultiplied
    foreground RGB, channel 3 = alpha matte."""

    cfg: Sapiens2Config

    @nn.compact
    def __call__(self, x):  # [B, gh, gw, embed_dim]
        c = self.cfg
        d = c.embed_dim
        x = nn.Conv(d, (3, 3), padding=1, dtype=c.dtype, name="input_conv")(x)
        x = nn.silu(_instance_norm(x))
        for i, ch in enumerate(c.head_channels):
            x = nn.Conv(ch * 4, (3, 3), padding=1, dtype=c.dtype, name=f"up_{i}")(x)
            x = nn.silu(_instance_norm(_pixel_shuffle(x, 2)))
        for i, ch in enumerate(c.head_conv_channels):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=c.dtype, name=f"conv_{i}")(x)
            x = nn.silu(_instance_norm(x))
        x = nn.Conv(4, (1, 1), dtype=c.dtype, name="conv_matting")(x)
        return nn.sigmoid(x)


class Sapiens2Matting(nn.Module):
    """Backbone + head (reference Sapiens2Matting :1012-1131)."""

    cfg: Sapiens2Config

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] imagenet-normalized
        feat = Sapiens2Backbone(self.cfg, name="backbone")(x)
        return MattingHead(self.cfg, name="decode_head")(feat)


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class MattingRunner:
    """PIL-in / PIL-out convenience mirroring the reference forward
    (:1102-1131): aspect-kept resize capped at max_res^2 px, snapped to the
    patch grid, imagenet normalization, alpha channel out at input size."""

    def __init__(self, config: Sapiens2Config, params: dict):
        self.config = config
        self.model = Sapiens2Matting(config)
        self.params = params
        self._apply = jax.jit(lambda v, x: self.model.apply({"params": v}, x))

    def __call__(self, image, max_res: int = 1024):
        import math

        from PIL import Image

        p = self.config.patch_size
        w, h = image.size
        th, tw = h, w
        if th * tw > max_res * max_res:
            s = math.sqrt((max_res * max_res) / (th * tw))
            th, tw = int(th * s), int(tw * s)
        th = max(p, (th // p) * p)
        tw = max(p, (tw // p) * p)
        arr = np.asarray(image.resize((tw, th), Image.BILINEAR), np.float32) / 255.0
        arr = (arr - _IMAGENET_MEAN) / _IMAGENET_STD
        out = np.asarray(self._apply(self.params, jnp.asarray(arr)[None]))
        alpha = np.clip(out[0, :, :, 3] * 255.0, 0, 255).astype(np.uint8)
        return Image.fromarray(alpha).resize(image.size).convert("RGB")


# ---- checkpoint import (reference from_pretrained state dict layout) ----

def import_sapiens2_matting(path: str) -> MattingRunner:
    """Load a reference-layout ``sapiens2_*_matting.safetensors`` file.

    Keys: backbone.{patch_embed.projection, cls_token, storage_tokens,
    rope_embed.periods, blocks.N.{ln1,ln2,attn.{wq,wk,wv,proj,q_norm,k_norm,
    gamma},ffn.{w12,w3}}, ln1}, decode_head.{input_conv.0, upsample_blocks.N.0,
    conv_layers.{0,3,6}, conv_matting}."""
    from safetensors import safe_open

    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)

    def lin(prefix):
        out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def conv(prefix):
        # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
        out = {"kernel": np.ascontiguousarray(
            sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    embed_dim = sd["backbone.patch_embed.projection.weight"].shape[0]
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("backbone.blocks.")
    )
    # head_dim from the per-head q_norm scale; every other dim from shapes
    head_dim = sd["backbone.blocks.0.attn.q_norm.weight"].shape[0]
    kv_pattern = tuple(
        sd[f"backbone.blocks.{i}.attn.wk.weight"].shape[0] // head_dim
        for i in range(num_layers)
    )
    n_up = sum(1 for k in sd if k.startswith("decode_head.upsample_blocks.")
               and k.endswith(".0.weight"))
    head_channels = tuple(
        sd[f"decode_head.upsample_blocks.{i}.0.weight"].shape[0] // 4
        for i in range(n_up)
    )
    conv_idx = sorted(
        int(k.split(".")[2]) for k in sd
        if k.startswith("decode_head.conv_layers.") and k.endswith(".weight")
    )
    head_conv_channels = tuple(
        sd[f"decode_head.conv_layers.{i}.weight"].shape[0] for i in conv_idx
    )
    cfg = Sapiens2Config(
        embed_dim=embed_dim, num_layers=num_layers,
        num_heads=embed_dim // head_dim,
        ffn_dim=sd["backbone.blocks.0.ffn.w12.weight"].shape[0] // 2,
        n_storage_tokens=sd["backbone.storage_tokens"].shape[1],
        kv_pattern=kv_pattern, head_channels=head_channels,
        head_conv_channels=head_conv_channels,
    )
    bb = {
        "patch_embed": conv("backbone.patch_embed.projection"),
        "cls_token": sd["backbone.cls_token"],
        "storage_tokens": sd["backbone.storage_tokens"],
        "rope_periods": sd["backbone.rope_embed.periods"],
        "ln1": {"scale": sd["backbone.ln1.weight"]},
    }
    for i in range(num_layers):
        p = f"backbone.blocks.{i}"
        bb[f"blocks_{i}"] = {
            "ln1": {"scale": sd[f"{p}.ln1.weight"]},
            "ln2": {"scale": sd[f"{p}.ln2.weight"]},
            "attn": {
                "wq": lin(f"{p}.attn.wq"),
                "wk": lin(f"{p}.attn.wk"),
                "wv": lin(f"{p}.attn.wv"),
                "proj": lin(f"{p}.attn.proj"),
                "q_norm": {"scale": sd[f"{p}.attn.q_norm.weight"]},
                "k_norm": {"scale": sd[f"{p}.attn.k_norm.weight"]},
                "gamma": sd[f"{p}.attn.gamma.weight"],
            },
            "ffn": {"w12": lin(f"{p}.ffn.w12"), "w3": lin(f"{p}.ffn.w3")},
        }
    head = {
        "input_conv": conv("decode_head.input_conv.0"),
        "conv_matting": conv("decode_head.conv_matting"),
    }
    for i in range(len(cfg.head_channels)):
        head[f"up_{i}"] = conv(f"decode_head.upsample_blocks.{i}.0")
    for i, idx in enumerate(conv_idx):
        head[f"conv_{i}"] = conv(f"decode_head.conv_layers.{idx}")
    params = {"backbone": bb, "decode_head": head}
    return MattingRunner(cfg, jax.tree.map(jnp.asarray, params))
