"""TIPSv2 DPT dense-prediction model (depth / normals / segmentation heads).

Exact port of the reference's vendored implementation
(``/root/reference/toolkit/models/tipsv2.py``): a DINOv2-style ViT backbone
(cls + register tokens, LayerScale, interpolatable pos table, :167-356) with
DPT heads (:488-705 — readout-project reassemble, PreAct fusion stack,
bin-weighted depth / l2-normalized normals / 150-class segmentation).
Backbone of the DFE v7/v8 perceptual loss
(``diffusion_feature_extraction.py:848-1060``).

TPU-first notes: the k==stride transposed convs in the reassemble stage are
einsum tile-expansions (one MXU matmul, bit-equal to torch ConvTranspose2d
in the non-overlapping case); align_corners=True upsampling is an explicit
gather+lerp (jax.image.resize only does half-pixel centers).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class TIPSConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 14
    img_size: int = 448  # pos-table native resolution
    num_register_tokens: int = 1
    init_values: float = 1.0  # LayerScale init
    # DPT
    channels: int = 256
    post_process_channels: tuple = (96, 192, 384, 768)
    block_indices: tuple = (2, 5, 8, 11)
    num_depth_bins: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0
    num_seg_classes: int = 150
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def b14_dpt(cls) -> "TIPSConfig":
        return cls()  # reference _B14_DPT_CONFIG

    @classmethod
    def tiny(cls) -> "TIPSConfig":
        return cls(embed_dim=32, depth=4, num_heads=2, patch_size=14,
                   img_size=56, channels=16, post_process_channels=(8, 12, 16, 24),
                   block_indices=(0, 1, 2, 3), num_depth_bins=16,
                   num_seg_classes=5)


def _ln(name):
    return nn.LayerNorm(epsilon=1e-6, name=name)


class _Block(nn.Module):
    cfg: TIPSConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d, nh = cfg.embed_dim, cfg.num_heads
        hd = d // nh
        b, s, _ = x.shape
        xn = _ln("norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(xn).reshape(b, s, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = dot_product_attention(q, k, v).reshape(b, s, d)
        attn = nn.Dense(d, name="proj")(attn)
        ls1 = self.param("ls1", nn.initializers.constant(cfg.init_values), (d,))
        x = x + attn * ls1
        xn = _ln("norm2")(x)
        h = nn.Dense(int(d * cfg.mlp_ratio), name="fc1")(xn)
        h = nn.Dense(d, name="fc2")(jax.nn.gelu(h, approximate=False))
        ls2 = self.param("ls2", nn.initializers.constant(cfg.init_values), (d,))
        return x + h * ls2


class TIPSVisionTransformer(nn.Module):
    """images [B, H, W, 3] (values in [0,1]; TIPSv2 applies no norm) ->
    list of (cls [B, D], patch [B, gh, gw, D]) at ``block_indices`` (final-
    normed), mirroring get_intermediate_layers(reshape=True, norm=True)."""

    cfg: TIPSConfig

    @nn.compact
    def __call__(self, images, collect=None):
        cfg = self.cfg
        p = cfg.patch_size
        d = cfg.embed_dim
        collect = tuple(collect if collect is not None else cfg.block_indices)
        x = nn.Conv(d, (p, p), strides=(p, p), name="patch_embed")(
            images.astype(cfg.dtype))
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        side = cfg.img_size // p
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, side * side + 1, d))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        x = x + _interp_pos(pos, side, gh, gw)
        if cfg.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, cfg.num_register_tokens, d))
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(reg, (b, cfg.num_register_tokens, d)),
                 x[:, 1:]], axis=1)
        outs = []
        for i in range(cfg.depth):
            x = _Block(cfg, name=f"block_{i}")(x)
            if i in collect:
                outs.append(x)
        norm = _ln("norm")
        nr = cfg.num_register_tokens
        result = []
        for o in outs:
            on = norm(o)
            result.append((on[:, 0], on[:, 1 + nr:].reshape(b, gh, gw, d)))
        return result


def _interp_pos(pos, side, gh, gw):
    """interpolate_pos_encoding (:314-346): bilinear-antialias resize of the
    patch table; cls row passes through."""
    if gh == side and gw == side:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    grid = patch_pos.reshape(1, side, side, -1)
    # reference F.interpolate(..., antialias=True); the (w0, h0) size order
    # with a [1, side, side, D] grid means the FIRST spatial axis gets w0 —
    # but prepare_tokens unpacks (w, h) from NCHW shape[-2:], so axis0 is
    # the image height: net effect is plain (gh, gw) resize.
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "linear",
                            antialias=True)
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


def _resize_ac_true(x, oh, ow):
    """Bilinear resize with align_corners=True (torch semantics) over
    [B, H, W, C]."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(ys.dtype))[None, :, None, None]
    wx = (xs - x0.astype(xs.dtype))[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _convt_tile(x, w, s):
    """ConvTranspose2d with kernel==stride (non-overlapping tiles):
    out[b, s*y+ky, s*x+kx, oc] = sum_ic x[b,y,x,ic] w[ky,kx,ic,oc] — one
    einsum/MXU matmul instead of a fractionally-strided conv."""
    b, h, wdt, ci = x.shape
    out = jnp.einsum("bhwi,yxio->bhywxo", x, w)
    return out.reshape(b, h * s, wdt * s, -1)


class _PreActUnit(nn.Module):
    features: int
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv1")(jax.nn.relu(x))
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(jax.nn.relu(x))
        return x + r


class _FusionBlock(nn.Module):
    features: int
    has_residual: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        if self.has_residual and residual is not None:
            if residual.shape != x.shape:
                residual = jax.image.resize(
                    residual, x.shape[:1] + x.shape[1:3] + residual.shape[-1:],
                    "linear")
            x = x + _PreActUnit(self.features, name="residual_unit")(residual)
        x = _PreActUnit(self.features, name="main_unit")(x)
        x = _resize_ac_true(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class _DPTTrunk(nn.Module):
    """reassemble (+readout project) -> convs -> fusion stack -> project."""

    cfg: TIPSConfig

    @nn.compact
    def __call__(self, feats):
        cfg = self.cfg
        d = cfg.embed_dim
        ppc = cfg.post_process_channels
        xs = []
        for i, (cls_tok, patch) in enumerate(feats):
            b, gh, gw, _ = patch.shape
            # readout 'project': concat the cls token onto every patch token
            ro = jnp.broadcast_to(cls_tok[:, None, None, :], patch.shape)
            x = jax.nn.gelu(
                nn.Dense(d, name=f"readout_{i}")(
                    jnp.concatenate([patch, ro], axis=-1)),
                approximate=False)
            x = nn.Conv(ppc[i], (1, 1), name=f"out_proj_{i}")(x)
            if i == 0:
                w = self.param(
                    "resize_0", nn.initializers.lecun_normal(), (4, 4, ppc[0], ppc[0]))
                bias = self.param("resize_0_bias", nn.initializers.zeros, (ppc[0],))
                x = _convt_tile(x, w, 4) + bias
            elif i == 1:
                w = self.param(
                    "resize_1", nn.initializers.lecun_normal(), (2, 2, ppc[1], ppc[1]))
                bias = self.param("resize_1_bias", nn.initializers.zeros, (ppc[1],))
                x = _convt_tile(x, w, 2) + bias
            elif i == 3:
                x = nn.Conv(ppc[3], (3, 3), strides=2, padding=1,
                            name="resize_3")(x)
            x = nn.Conv(cfg.channels, (3, 3), padding=1, use_bias=False,
                        name=f"conv_{i}")(x)
            xs.append(x)
        out = _FusionBlock(cfg.channels, has_residual=False, name="fusion_0")(xs[-1])
        for i in range(1, 4):
            out = _FusionBlock(cfg.channels, has_residual=True,
                               name=f"fusion_{i}")(out, xs[-(i + 1)])
        return nn.Conv(cfg.channels, (3, 3), padding=1, name="project")(out)


class TIPSv2DPT(nn.Module):
    """images [B, H, W, 3] in [0,1] -> dict(head, depth, normals,
    segmentation) — the DFE v7 feature stack (reference
    diffusion_feature_extraction.py:873-915)."""

    cfg: TIPSConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        feats = TIPSVisionTransformer(cfg, name="vit")(images)
        # head: the 4 intermediate patch grids channel-concatenated
        head = jnp.concatenate([p for _, p in feats], axis=-1)
        h, w = images.shape[1:3]

        trunk_d = _DPTTrunk(cfg, name="depth_trunk")(feats)
        out = nn.Dense(cfg.num_depth_bins, name="depth_linear")(
            jax.nn.relu(trunk_d))
        bins = jnp.linspace(cfg.min_depth, cfg.max_depth, cfg.num_depth_bins)
        out = jax.nn.relu(out) + cfg.min_depth
        out = out / jnp.sum(out, axis=-1, keepdims=True)
        depth = jnp.einsum("bhwn,n->bhw", out, bins)[..., None]
        depth = jax.image.resize(depth, (depth.shape[0], h, w, 1), "linear")

        trunk_n = _DPTTrunk(cfg, name="normals_trunk")(feats)
        nrm = nn.Dense(3, name="normals_linear")(trunk_n)
        nrm = nrm / jnp.clip(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        nrm = jax.image.resize(nrm, (nrm.shape[0], h, w, 3), "linear")

        trunk_s = _DPTTrunk(cfg, name="seg_trunk")(feats)
        seg = nn.Dense(cfg.num_seg_classes, name="seg_linear")(trunk_s)
        seg = jax.image.resize(seg, (seg.shape[0], h, w, seg.shape[-1]),
                               "linear")
        return {"head": head, "depth": depth, "normals": nrm,
                "segmentation": seg}


# ---------------------------------------------------------------- importer

def _lin(flat, key):
    return {"kernel": np.ascontiguousarray(np.asarray(flat[key + ".weight"], np.float32).T),
            "bias": np.asarray(flat[key + ".bias"], np.float32)}


def _conv(flat, key, bias=True):
    out = {"kernel": np.ascontiguousarray(
        np.asarray(flat[key + ".weight"], np.float32).transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = np.asarray(flat[key + ".bias"], np.float32)
    return out


def _ln_p(flat, key):
    return {"scale": np.asarray(flat[key + ".weight"], np.float32),
            "bias": np.asarray(flat[key + ".bias"], np.float32)}


def tipsv2_tree(flat: dict, cfg: TIPSConfig) -> dict:
    """torch state dict (reference key layout: ``vision_encoder.blocks.*``,
    ``depth_head.reassemble.*`` ...) -> flax param tree."""
    vit: dict = {
        "patch_embed": _conv(flat, "vision_encoder.patch_embed.proj"),
        "cls_token": np.asarray(flat["vision_encoder.cls_token"], np.float32),
        "pos_embed": np.asarray(flat["vision_encoder.pos_embed"], np.float32),
        "norm": _ln_p(flat, "vision_encoder.norm"),
    }
    if cfg.num_register_tokens:
        vit["register_tokens"] = np.asarray(
            flat["vision_encoder.register_tokens"], np.float32)
    for i in range(cfg.depth):
        pre = f"vision_encoder.blocks.{i}."
        vit[f"block_{i}"] = {
            "norm1": _ln_p(flat, pre + "norm1"),
            "qkv": _lin(flat, pre + "attn.qkv"),
            "proj": _lin(flat, pre + "attn.proj"),
            "ls1": np.asarray(flat[pre + "ls1.gamma"], np.float32),
            "norm2": _ln_p(flat, pre + "norm2"),
            "fc1": _lin(flat, pre + "mlp.fc1"),
            "fc2": _lin(flat, pre + "mlp.fc2"),
            "ls2": np.asarray(flat[pre + "ls2.gamma"], np.float32),
        }

    def trunk(src: str) -> dict:
        t: dict = {}
        for i in range(4):
            t[f"readout_{i}"] = _lin(flat, f"{src}.reassemble.readout_projects.{i}")
            t[f"out_proj_{i}"] = _conv(flat, f"{src}.reassemble.out_projections.{i}")
            t[f"conv_{i}"] = _conv(flat, f"{src}.convs.{i}", bias=False)
        for idx, s in ((0, 4), (1, 2)):
            w = np.asarray(flat[f"{src}.reassemble.resize_layers.{idx}.weight"],
                           np.float32)  # torch convT [in, out, kh, kw]
            t[f"resize_{idx}"] = np.ascontiguousarray(w.transpose(2, 3, 0, 1))
            t[f"resize_{idx}_bias"] = np.asarray(
                flat[f"{src}.reassemble.resize_layers.{idx}.bias"], np.float32)
        t["resize_3"] = _conv(flat, f"{src}.reassemble.resize_layers.3")
        for i in range(4):
            fb: dict = {"main_unit": {
                "conv1": _conv(flat, f"{src}.fusion_blocks.{i}.main_unit.conv1", bias=False),
                "conv2": _conv(flat, f"{src}.fusion_blocks.{i}.main_unit.conv2", bias=False),
            }, "out_conv": _conv(flat, f"{src}.fusion_blocks.{i}.out_conv")}
            if i > 0:
                fb["residual_unit"] = {
                    "conv1": _conv(flat, f"{src}.fusion_blocks.{i}.residual_unit.conv1", bias=False),
                    "conv2": _conv(flat, f"{src}.fusion_blocks.{i}.residual_unit.conv2", bias=False),
                }
            t[f"fusion_{i}"] = fb
        t["project"] = _conv(flat, f"{src}.project")
        return t

    return {
        "vit": vit,
        "depth_trunk": trunk("depth_head"),
        "depth_linear": _lin(flat, "depth_head.depth_head"),
        "normals_trunk": trunk("normals_head"),
        "normals_linear": _lin(flat, "normals_head.normals_head"),
        "seg_trunk": trunk("segmentation_head"),
        "seg_linear": _lin(flat, "segmentation_head.segmentation_head"),
    }


def load_tipsv2_dpt(path: str):
    """Local dir with the merged ``model.safetensors`` (DPT heads +
    ``vision_encoder.*`` backbone, reference from_pretrained :867-935) ->
    (module, params)."""
    import os

    from safetensors import safe_open

    flat = {}
    for fn in ("model.safetensors", "dpt.safetensors", "backbone.safetensors"):
        fp = os.path.join(path, fn)
        if os.path.exists(fp):
            with safe_open(fp, "np") as f:
                for k in f.keys():
                    flat.setdefault(k, f.get_tensor(k))
    if not flat:
        raise FileNotFoundError(f"no tipsv2 safetensors under {path}")
    cfg = TIPSConfig.b14_dpt()
    return TIPSv2DPT(cfg), tipsv2_tree(flat, cfg)
