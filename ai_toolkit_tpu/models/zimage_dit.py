"""Z-Image family DiT — exact reimplementation + model wrappers.

Parity targets (all in-reference):

* Trunk semantics: the vendored ZImageDCT sources
  ``extensions_built_in/diffusion_models/zeta_chroma/zeta_chroma_transformer.py``
  (ZImageTransformerBlock:208-271 — RMSNorm sandwich blocks with tanh-gated
  4-way AdaLN from a 256-d timestep embedding, per-head RMSNorm q/k, complex
  (interleaved-pair) rope over axes (32,48,48) θ=256, SwiGLU FFN of width
  ``int(dim/3*8)``; TimestepEmbedder:84-118 — freq 256, mid 1024, out
  ``min(dim, 256)``, [cos|sin] order; noise_refiner (modulated) over image
  tokens + context_refiner (unmodulated) over caption tokens, then a unified
  single stream).
* ``zeta_chroma``: the full vendored ZImageDCT (pixel-space, 32x32x3 patch
  tokens, NerfEmbedder/ResBlock/DCTFinalLayer decoder head :328-449, x0
  residual :627-651) + wrapper ``zeta_chroma_model.py`` (Qwen3 TE at
  hidden_states[-2], FakeVAE, t_vec = timestep/1000, loss target
  noise - latents) + position builders ``zeta_chroma_transformer.py:681-717``
  (text axis-0 positions ``min(1..T, L)``, image axis-0 position = L).
* ``zimage`` / ``zimage_l2p``: the diffusers ZImageTransformer2DModel as
  pinned by in-reference code — the single-file key conversion
  ``toolkit/models/v2/z_image.py:37-58`` (fused qkv, q_norm/k_norm,
  x_embedder/final_layer routing), the default config
  ``z_image_l2p_model.py:38-57`` (dim 3840, 30+2 layers, 30 heads, patch 2,
  in 16), the L2P forward ``z_image_l2p_model.py:156-288`` (IMAGE tokens
  first in the unified sequence, ``adaln_input = t_embedder(t*t_scale)``
  with wrapper ``t = (1000-timestep)/1000``, MicroDiffusionModel U-Net
  decoder :60-138), and wrapper ``z_image.py`` (output negated, loss target
  noise - latents, bucket divisibility 16, Qwen3 TE). The FinalLayer head
  (paramless LN + scale-only AdaLN + linear, keys
  ``final_layer.{linear,adaLN_modulation.1}``) follows the Lumina-2 family
  convention this architecture derives from; positions use the in-family
  builders above.

TPU-first notes: static [B, S, D] padded sequences with masks replace the
reference's per-sample list packing (pad slots carry the checkpoint's learned
x_pad_token/cap_pad_token exactly like diffusers' ``_prepare_sequence``);
rope angles are computed in-graph (image axis-0 position is each sample's
valid text length — data, not shape); the 30 unified blocks run under
``nn.scan`` (params stacked [L, ...]) with remat; attention uses the shared
dispatch (flash on TPU) with a [B,1,1,S] key-validity mask.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@dataclass(frozen=True)
class ZImageConfig:
    # token-space dims (the wrapper patchifies; in_feats = p*p*in_channels)
    in_feats: int = 64            # zimage: 2*2*16; zeta: 32*32*3 = 3072
    out_feats: int = 64           # final/dct head output feature width
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    n_kv_heads: int = 30
    norm_eps: float = 1e-5
    qk_norm: bool = True
    cap_feat_dim: int = 2560
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: tuple[int, int, int] = (32, 48, 48)
    adaln_embed_dim: int = 256
    # head: 'final' (zimage latent), 'dct' (zeta pixel decoder),
    # 'l2p' (MicroDiffusionModel pixel U-Net)
    head: str = "final"
    # zeta concatenates [txt, img] (zeta_chroma_transformer.py:600); the
    # diffusers zimage unified sequence is [img, txt] (z_image_l2p_model.py:277)
    text_first: bool = False
    # dct head (ZImageDCTParams:36-38)
    dct_in_channels: int = 3072   # per-pixel-group channels fed to NerfEmbedder
    dct_patch: int = 1            # params.patch_size (pixels per token group)
    decoder_hidden_size: int = 3840
    decoder_num_res_blocks: int = 4
    decoder_max_freqs: int = 8
    use_x0: bool = True
    # l2p head
    l2p_in_channels: int = 3
    l2p_patch: int = 16
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.dim, self.adaln_embed_dim)

    @property
    def ffn_hidden(self) -> int:
        return int(self.dim / 3 * 8)

    @classmethod
    def tiny(cls, **kw) -> "ZImageConfig":
        base = dict(
            in_feats=16, out_feats=16, dim=32, n_layers=2, n_refiner_layers=1,
            n_heads=2, n_kv_heads=2, cap_feat_dim=24, axes_dims=(4, 6, 6),
            dct_in_channels=16, decoder_hidden_size=32, decoder_num_res_blocks=2,
            remat=False, dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


def patchify(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)(W/p), p*p*C] in (dh, dw, c) feature order
    (``vae_flatten``, zeta_chroma_transformer.py:654-664)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(tokens: jax.Array, h: int, w: int, p: int) -> jax.Array:
    """Inverse of :func:`patchify` (``vae_unflatten``)."""
    b, n, f = tokens.shape
    c = f // (p * p)
    x = tokens.reshape(b, h // p, w // p, p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def zimage_pos_angles(
    cfg: ZImageConfig, hp: int, wp: int, text_lens: jax.Array, t_max: int
) -> tuple[jax.Array, jax.Array]:
    """Per-token rope angles ([B, N, hd/2], [B, T, hd/2]).

    Mirrors the reference position builders (zeta_chroma_transformer.py:
    ``make_text_position_ids``:704-717 — text axis-0 position
    ``min(arange(1, T+1), L)``; ``prepare_latent_image_ids``:681-701 — image
    axis-0 position = L (the sample's valid text length), axes 1/2 = row/col)
    through ``RopeEmbedder``:274-318 (per-axis angles pos * θ^(-2i/d),
    concatenated over the 3 axes)."""
    b = text_lens.shape[0]
    n_img = hp * wp

    def omega(d: int) -> jax.Array:
        return 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))

    o0, o1, o2 = (omega(d) for d in cfg.axes_dims)
    ell = text_lens.astype(jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(hp, dtype=jnp.float32),
                          jnp.arange(wp, dtype=jnp.float32), indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    img = jnp.concatenate([
        ell[:, None, None] * o0[None, None, :] * jnp.ones((1, n_img, 1)),
        jnp.broadcast_to((yy[:, None] * o1[None, :])[None], (b, n_img, o1.shape[0])),
        jnp.broadcast_to((xx[:, None] * o2[None, :])[None], (b, n_img, o2.shape[0])),
    ], axis=-1)
    tpos = jnp.minimum(jnp.arange(1, t_max + 1, dtype=jnp.float32)[None], ell[:, None])
    txt = jnp.concatenate([
        tpos[:, :, None] * o0[None, None, :],
        jnp.zeros((b, t_max, o1.shape[0] + o2.shape[0])),
    ], axis=-1)
    return img, txt


def _apply_rope(x: jax.Array, ang: jax.Array) -> jax.Array:
    """Complex rotation with interleaved pairs (``apply_rotary_emb``:143-148:
    view_as_complex over (..., -1, 2) pairs, f32 math, cast back)."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = jnp.cos(ang)[:, :, None]
    s = jnp.sin(ang)[:, :, None]
    oe = xe * c - xo * s
    oo = xe * s + xo * c
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)


class ZImageAttention(nn.Module):
    """ZImageAttention (zeta_chroma_transformer.py:151-205)."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, ang, mask):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        b, s, _ = x.shape
        q = Linear(nh * hd, use_bias=False, dtype=dt, param_dtype=pdt, name="to_q")(x)
        k = Linear(nkv * hd, use_bias=False, dtype=dt, param_dtype=pdt, name="to_k")(x)
        v = Linear(nkv * hd, use_bias=False, dtype=dt, param_dtype=pdt, name="to_v")(x)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        if cfg.qk_norm:
            q = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="q_norm")(q)
            k = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="k_norm")(k)
        q = _apply_rope(q, ang)
        k = _apply_rope(k, ang)
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=2)
            v = jnp.repeat(v, nh // nkv, axis=2)
        o = dot_product_attention(q, k, v, mask=mask).reshape(b, s, nh * hd)
        return Linear(cfg.dim, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="to_out")(o)


class ZImageBlock(nn.Module):
    """ZImageTransformerBlock (zeta_chroma_transformer.py:208-271)."""

    cfg: ZImageConfig
    modulation: bool = True

    @nn.compact
    def __call__(self, x, ang, mask, adaln=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        norm = lambda nm: RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name=nm)
        attn = ZImageAttention(cfg, name="attention")
        if self.modulation:
            mod = Linear(4 * cfg.dim, dtype=dt, param_dtype=pdt,
                         name="adaLN_modulation")(adaln)
            sc_a, g_a, sc_m, g_m = jnp.split(mod.astype(jnp.float32)[:, None], 4, axis=-1)
            g_a, g_m = jnp.tanh(g_a), jnp.tanh(g_m)
            sc_a, sc_m = 1.0 + sc_a, 1.0 + sc_m
            h = (norm("attention_norm1")(x).astype(jnp.float32) * sc_a).astype(dt)
            a = attn(h, ang, mask)
            x = x + (g_a * norm("attention_norm2")(a).astype(jnp.float32)).astype(dt)
            h = (norm("ffn_norm1")(x).astype(jnp.float32) * sc_m).astype(dt)
            f = self._ffn(h)
            x = x + (g_m * norm("ffn_norm2")(f).astype(jnp.float32)).astype(dt)
        else:
            a = attn(norm("attention_norm1")(x), ang, mask)
            x = x + norm("attention_norm2")(a)
            f = self._ffn(norm("ffn_norm1")(x))
            x = x + norm("ffn_norm2")(f)
        return x

    def _ffn(self, h):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        w1 = Linear(cfg.ffn_hidden, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="ff_w1")(h)
        w3 = Linear(cfg.ffn_hidden, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="ff_w3")(h)
        return Linear(cfg.dim, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="ff_w2")(nn.silu(w1) * w3)


class _ZCarry(nn.Module):
    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, ang, mask, adaln):
        return ZImageBlock(self.cfg, modulation=True, name="block")(
            x, ang, mask, adaln), None


class DecNet(nn.Module):
    """SimpleMLPAdaLN pixel decoder (zeta_chroma_transformer.py:417-449):
    NerfEmbedder (DCT positional features) + AdaLN ResBlocks + zero-init
    final projection. Token-batched: x [B, N, P2, C], cond [B, N, dim]."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, cond):
        cfg = self.cfg
        pdt = cfg.param_dtype
        mch = cfg.decoder_hidden_size
        p2 = cfg.dct_patch * cfg.dct_patch

        # NerfEmbedder (:328-368): f32 math, DCT grid features for the patch
        dct = _nerf_dct_features(cfg.dct_patch, cfg.decoder_max_freqs)
        xf = x.astype(jnp.float32)
        dctb = jnp.broadcast_to(jnp.asarray(dct, jnp.float32)[None, None],
                                (*xf.shape[:2], *dct.shape))
        h = Linear(mch, dtype=jnp.float32, param_dtype=pdt, name="input_embedder")(
            jnp.concatenate([xf, dctb], axis=-1))
        h = h.astype(cfg.dtype)

        y = Linear(p2 * mch, dtype=cfg.dtype, param_dtype=pdt, name="cond_embed")(cond)
        y = y.reshape(*y.shape[:2], p2, mch)

        for i in range(cfg.decoder_num_res_blocks):
            h = _DecResBlock(cfg, name=f"res_{i}")(h, y)

        # DCTFinalLayer (:403-414): paramless LN eps 1e-6 + zero-init linear
        h = _layer_norm(h, 1e-6, scale=None, bias=None)
        return Linear(cfg.dct_in_channels, dtype=cfg.dtype, param_dtype=pdt,
                      name="final_linear")(h)


def _nerf_dct_features(patch: int, max_freqs: int) -> np.ndarray:
    """NerfEmbedder.fetch_pos (:337-356): [p*p, max_freqs**2] DCT features."""
    pos = np.linspace(0.0, 1.0, patch, dtype=np.float64) if patch > 1 else np.zeros((1,))
    py, px = np.meshgrid(pos, pos, indexing="ij")
    px = px.reshape(-1, 1, 1)
    py = py.reshape(-1, 1, 1)
    f = np.linspace(0, max_freqs - 1, max_freqs, dtype=np.float64)
    fx = f[None, :, None]
    fy = f[None, None, :]
    coeffs = 1.0 / (1.0 + fx * fy)
    dct = np.cos(px * fx * np.pi) * np.cos(py * fy * np.pi) * coeffs
    return dct.reshape(patch * patch, max_freqs * max_freqs).astype(np.float32)


def _layer_norm(x, eps, scale=None, bias=None):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class _DecResBlock(nn.Module):
    """ResBlock (:371-400): affine LN + SiLU MLP, 3-way AdaLN (shift, scale,
    gate) computed from the per-token condition."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, y):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        ch = cfg.decoder_hidden_size
        mod = Linear(3 * ch, dtype=dt, param_dtype=pdt, name="adaLN")(nn.silu(y))
        sh, sc, g = jnp.split(mod.astype(jnp.float32), 3, axis=-1)
        scale = self.param("in_ln_scale", nn.initializers.ones_init(), (ch,), pdt)
        bias = self.param("in_ln_bias", nn.initializers.zeros_init(), (ch,), pdt)
        h = _layer_norm(x, 1e-6, scale, bias).astype(jnp.float32) * (1.0 + sc) + sh
        h = Linear(ch, dtype=dt, param_dtype=pdt, name="mlp_0")(h.astype(dt))
        h = Linear(ch, dtype=dt, param_dtype=pdt, name="mlp_2")(nn.silu(h))
        return x + (g * h.astype(jnp.float32)).astype(dt)


class LocalDecoder(nn.Module):
    """MicroDiffusionModel (z_image_l2p_model.py:60-138): 4-stage pixel U-Net
    fusing the transformer feature map at the bottleneck. NHWC."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, c):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        conv = lambda ch, k, nm: nn.Conv(ch, (k, k), padding=((k // 2, k // 2),) * 2,
                                         dtype=dt, param_dtype=pdt, name=nm)
        pool = lambda z: nn.max_pool(z, (2, 2), strides=(2, 2))
        up = lambda z: jax.image.resize(
            z, (z.shape[0], 2 * z.shape[1], 2 * z.shape[2], z.shape[3]), "nearest")

        x = x.astype(dt)
        e1 = nn.silu(conv(64, 3, "enc1_0")(x))
        e2 = nn.silu(conv(128, 3, "enc2_0")(pool(e1)))
        e3 = nn.silu(conv(256, 3, "enc3_0")(pool(e2)))
        e4 = nn.silu(conv(512, 3, "enc4_0")(pool(e3)))
        p4 = pool(e4)
        if c.shape[1:3] != p4.shape[1:3]:
            c = jax.image.resize(c, (c.shape[0], *p4.shape[1:3], c.shape[3]), "nearest")
        b = nn.silu(conv(512, 1, "bottleneck_0")(
            jnp.concatenate([p4, c.astype(dt)], axis=-1)))
        d4 = nn.silu(conv(256, 3, "dec4_0")(jnp.concatenate([conv(512, 3, "up4_1")(up(b)), e4], -1)))
        d3 = nn.silu(conv(128, 3, "dec3_0")(jnp.concatenate([conv(256, 3, "up3_1")(up(d4)), e3], -1)))
        d2 = nn.silu(conv(64, 3, "dec2_0")(jnp.concatenate([conv(128, 3, "up2_1")(up(d3)), e2], -1)))
        d1 = nn.silu(conv(64, 3, "dec1_0")(jnp.concatenate([conv(64, 3, "up1_1")(up(d2)), e1], -1)))
        return nn.Conv(cfg.l2p_in_channels, (1, 1), dtype=dt, param_dtype=pdt,
                       name="out_conv")(d1)


class ZImageDiT(nn.Module):
    """The unified trunk + selected head. Returns what the reference
    transformer's ``forward`` returns (zeta: negated + x0 residual applied;
    zimage/l2p: the raw decoder output — their model wrappers negate)."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, img, txt, t_sigma, img_ang, txt_ang,
                 img_mask=None, txt_mask=None, pixels=None, hp=None, wp=None):
        """img: [B, N, in_feats] patch tokens; txt: [B, T, cap_feat_dim];
        t_sigma: [B] noise level in (0,1], 1 = pure noise (the embedder sees
        ``(1 - t_sigma) * t_scale`` — zeta_chroma_transformer.py:585);
        masks: bool validity; pixels: [B, H, W, 3] noisy image (l2p head)."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n_img = img.shape[:2]
        t_max = txt.shape[1]

        # TimestepEmbedder (:84-118): freq 256, [cos|sin], mid 1024
        half = 128
        freqs = jnp.exp(-math.log(10_000.0)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        arg = ((1.0 - t_sigma.astype(jnp.float32)) * cfg.t_scale)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.cos(arg), jnp.sin(arg)], axis=-1).astype(dt)
        temb = Linear(1024, dtype=dt, param_dtype=pdt, name="t_in")(temb)
        adaln = Linear(cfg.adaln_dim, dtype=dt, param_dtype=pdt,
                       name="t_out")(nn.silu(temb))

        img_h = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="x_embedder")(
            img.astype(dt))
        txt_h = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt,
                        name="cap_norm")(txt.astype(dt))
        txt_h = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="cap_proj")(txt_h)

        # learned pad tokens fill invalid slots (diffusers _prepare_sequence)
        x_pad = self.param("x_pad_token", nn.initializers.normal(0.02), (1, cfg.dim), pdt)
        c_pad = self.param("cap_pad_token", nn.initializers.normal(0.02), (1, cfg.dim), pdt)
        if img_mask is not None:
            img_h = jnp.where(img_mask[:, :, None], img_h, x_pad[None].astype(dt))
        if txt_mask is not None:
            txt_h = jnp.where(txt_mask[:, :, None], txt_h, c_pad[None].astype(dt))

        im = jnp.ones((b, n_img), bool) if img_mask is None else img_mask.astype(bool)
        tm = jnp.ones((b, t_max), bool) if txt_mask is None else txt_mask.astype(bool)
        amask_i = im[:, None, None, :]
        amask_t = tm[:, None, None, :]

        for i in range(cfg.n_refiner_layers):
            img_h = ZImageBlock(cfg, modulation=True, name=f"noise_refiner_{i}")(
                img_h, img_ang, amask_i, adaln)
        for i in range(cfg.n_refiner_layers):
            txt_h = ZImageBlock(cfg, modulation=False, name=f"context_refiner_{i}")(
                txt_h, txt_ang, amask_t)

        if cfg.text_first:
            seq = jnp.concatenate([txt_h, img_h], axis=1)
            ang = jnp.concatenate([txt_ang, img_ang], axis=1)
            amask = jnp.concatenate([tm, im], axis=1)[:, None, None, :]
        else:
            seq = jnp.concatenate([img_h, txt_h], axis=1)
            ang = jnp.concatenate([img_ang, txt_ang], axis=1)
            amask = jnp.concatenate([im, tm], axis=1)[:, None, None, :]

        if cfg.scan_blocks:
            Carry = nn.remat(_ZCarry, prevent_cse=False) if cfg.remat else _ZCarry
            seq, _ = nn.scan(
                Carry,
                length=cfg.n_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 3,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="layers")(seq, ang, amask, adaln)
        else:
            for i in range(cfg.n_layers):
                seq = ZImageBlock(cfg, modulation=True, name=f"layer_{i}")(
                    seq, ang, amask, adaln)

        img_out = seq[:, t_max:] if cfg.text_first else seq[:, :n_img]

        if cfg.head == "dct":
            # SimpleMLPAdaLN over the ORIGINAL noisy patch tokens (:581-625)
            pix = img.reshape(b, n_img, cfg.dct_patch ** 2, cfg.dct_in_channels)
            out = DecNet(cfg, name="dec_net")(pix, img_out)
            out = -out.reshape(b, n_img, -1)
            if cfg.use_x0:
                # x0 residual (:627-628): (noisy - pred) / t
                tt = t_sigma.astype(jnp.float32)[:, None, None]
                out = (img.astype(jnp.float32) - out.astype(jnp.float32)) / tt
                out = out.astype(cfg.dtype)
            return out
        if cfg.head == "l2p":
            feat = img_out.reshape(b, hp, wp, cfg.dim)
            return LocalDecoder(cfg, name="local_decoder")(pixels, feat)
        # FinalLayer: paramless LN, scale-only AdaLN, linear (Lumina-2 family)
        scale = Linear(cfg.dim, dtype=dt, param_dtype=pdt,
                       name="final_adaln")(nn.silu(adaln))
        h = _layer_norm(img_out, 1e-6) * (1.0 + scale.astype(img_out.dtype)[:, None])
        return Linear(cfg.out_feats, dtype=dt, param_dtype=pdt,
                      name="final_linear")(h)


def zimage_lora_targets() -> list[str]:
    return [r"(to_q|to_k|to_v|to_out|ff_w1|ff_w2|ff_w3)$"]


def zimage_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(to_q|to_k|to_v|ff_w1|ff_w3)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(to_out|ff_w2)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


def _qwen3_te_config(d: dict) -> LLMConfig:
    base = LLMConfig.qwen3_2b()
    return LLMConfig(
        vocab_size=d.get("vocab_size", base.vocab_size),
        d_model=d.get("hidden_size", 2560),
        n_layers=d.get("num_hidden_layers", 36),
        n_heads=d.get("num_attention_heads", 32),
        n_kv_heads=d.get("num_key_value_heads", 8),
        head_dim=d.get("head_dim", 128),
        d_ff=d.get("intermediate_size", 9728),
        rope_theta=float(d.get("rope_theta", 1_000_000.0)),
        rms_eps=float(d.get("rms_norm_eps", 1e-6)),
        qk_head_norm=True,
        # hidden_states[-2] == output of layer n-2 in the HF tuple layout
        # (zeta_chroma_pipeline.py:55 "same as training")
        collect_layers=(d.get("num_hidden_layers", 36) - 2,),
    )


class _ZImageBase(BaseTpuModel):
    """Shared wrapper plumbing for the three Z-Image-family archs."""

    is_flow_matching = True
    max_txt_len = 512
    flowmatch_shift = 3.0  # scheduler_config shift 3.0 (z_image.py:42-46)

    def _config_json(self, sub: str) -> dict:
        import json
        import os

        for root in (self.config.name_or_path, self.config.extras_name_or_path):
            if not root or not os.path.isdir(str(root)):
                continue
            p = os.path.join(str(root), sub, "config.json")
            if os.path.isfile(p):
                with open(p) as f:
                    d = json.load(f)
                return d.get("text_config", d) if sub == "text_encoder" else d
        return dict(self.config.model_kwargs.get(f"{sub}_config", {}))

    def _init_te_tokenizer(self, tiny: bool):
        if tiny:
            self.llm_config = LLMConfig.tiny(qk_head_norm=True, collect_layers=(0,))
            self.max_txt_len = 16
        else:
            self.llm_config = _qwen3_te_config(self._config_json("text_encoder"))
        self.te = LLMEncoder(self.llm_config)
        tok_root = self.config.extras_name_or_path or self.config.name_or_path
        self.tokenizer = load_tokenizer(
            tok_root if (tok_root and not str(tok_root).endswith(".safetensors"))
            else None,
            "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=min(151_645, self.llm_config.vocab_size - 1),
            max_len=self.max_txt_len,
        )

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        out = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        # second-to-last hidden state (zeta_chroma_pipeline.py:55)
        txt = out["collected"][0] if isinstance(out, dict) else out
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def _dit_colls(self, variables):
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        return colls

    def _refuse(self, what: str):
        raise FileNotFoundError(
            f"arch '{self.config.arch}': no {what} found under "
            f"'{self.config.name_or_path}' — refusing to random-init a named "
            f'model. Use name_or_path: "" for experiments from scratch.'
        )

    def lora_targets(self):
        return zimage_lora_targets()

    def partition_rules(self):
        return zimage_partition_rules()


@register_model
class ZImageModel(_ZImageBase):
    """zimage: 16-ch f8 VAE latents, 2x2 patch tokens, FinalLayer head,
    output negated (z_image.py:399-404), loss target noise - latents."""

    arch = "zimage"
    archs = ["zimage"]
    bucket_divisibility = 16  # 8 VAE * 2 patch (z_image.py:82)

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        tiny = config.model_kwargs.get("size", "full") == "tiny"
        if tiny:
            self.dit_config = ZImageConfig.tiny(cap_feat_dim=64)
            self.vae_config = VAEConfig.tiny(latent_channels=4)
        else:
            d = self._config_json("transformer")
            in_ch = d.get("in_channels", 16)
            p = (d.get("all_patch_size") or [2])[0]
            self.dit_config = ZImageConfig(
                in_feats=p * p * in_ch, out_feats=p * p * in_ch,
                dim=d.get("dim", 3840), n_layers=d.get("n_layers", 30),
                n_refiner_layers=d.get("n_refiner_layers", 2),
                n_heads=d.get("n_heads", 30), n_kv_heads=d.get("n_kv_heads", 30),
                norm_eps=float(d.get("norm_eps", 1e-5)),
                qk_norm=bool(d.get("qk_norm", True)),
                cap_feat_dim=d.get("cap_feat_dim", 2560),
                rope_theta=float(d.get("rope_theta", 256.0)),
                t_scale=float(d.get("t_scale", 1000.0)),
                axes_dims=tuple(d.get("axes_dims") or (32, 48, 48)),
            )
            self.vae_config = VAEConfig.flux()
        self.patch = 2
        self.latent_channels = self.dit_config.in_feats // (self.patch * self.patch)
        self.dit = ZImageDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self._init_te_tokenizer(tiny)

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        ia, ta = zimage_pos_angles(cfg, 2, 2, jnp.asarray([4]), 4)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, cfg.in_feats)),
            jnp.zeros((1, 4, cfg.cap_feat_dim)), jnp.asarray([0.5]), ia, ta)
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale,
                              2 * self.vae_config.downscale, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"],
                "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer"))
                     or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_zimage_checkpoint

            return load_zimage_checkpoint(path, self)
        if path:
            self._refuse("transformer/ dir or single-file checkpoint")
        return self.init_variables(rng)

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = patchify(noisy_latents, self.patch)
        hp, wp = h // self.patch, w // self.patch
        tm = cond.get("txt_mask")
        lens = (tm.sum(-1).astype(jnp.int32) if tm is not None
                else jnp.full((b,), cond["txt"].shape[1], jnp.int32))
        ia, ta = zimage_pos_angles(self.dit_config, hp, wp, lens, cond["txt"].shape[1])
        out = self.dit.apply(self._dit_colls(variables), img, cond["txt"], t,
                             ia, ta, None, tm)
        # wrapper negates the model output (z_image.py:402)
        return unpatchify(-out, h, w, self.patch)

    def encode_images(self, variables, images, rng=None):
        return self.vae.apply({"params": variables["vae"]}, images, rng,
                              method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents,
                              method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return (h // self.patch) * (w // self.patch)


@register_model
class ZImageL2PModel(_ZImageBase):
    """zimage_l2p: pixel-space Z-Image — trunk over 16x16 pixel patches, the
    MicroDiffusionModel U-Net decodes in pixel space (z_image_l2p_model.py).
    Identity "VAE": the latents ARE the [-1,1] image."""

    arch = "zimage_l2p"
    archs = ["zimage_l2p"]
    bucket_divisibility = 16

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        tiny = config.model_kwargs.get("size", "full") == "tiny"
        if tiny:
            self.dit_config = ZImageConfig.tiny(
                head="l2p", in_feats=3 * 16 * 16, l2p_patch=16, cap_feat_dim=64)
        else:
            d = self._config_json("transformer")
            in_ch = d.get("in_channels", 3)
            p = (d.get("all_patch_size") or [16])[0]
            self.dit_config = ZImageConfig(
                head="l2p", in_feats=p * p * in_ch, out_feats=p * p * in_ch,
                l2p_in_channels=in_ch, l2p_patch=p,
                dim=d.get("dim", 3840), n_layers=d.get("n_layers", 30),
                n_refiner_layers=d.get("n_refiner_layers", 2),
                n_heads=d.get("n_heads", 30), n_kv_heads=d.get("n_kv_heads", 30),
                norm_eps=float(d.get("norm_eps", 1e-5)),
                cap_feat_dim=d.get("cap_feat_dim", 2560),
                rope_theta=float(d.get("rope_theta", 256.0)),
                t_scale=float(d.get("t_scale", 1000.0)),
                axes_dims=tuple(d.get("axes_dims") or (32, 48, 48)),
            )
        self.patch = self.dit_config.l2p_patch
        self.dit = ZImageDiT(self.dit_config)
        self._init_te_tokenizer(tiny)

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_te = jax.random.split(rng)
        cfg = self.dit_config
        p = self.patch
        ia, ta = zimage_pos_angles(cfg, 2, 2, jnp.asarray([4]), 4)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, cfg.in_feats)),
            jnp.zeros((1, 4, cfg.cap_feat_dim)), jnp.asarray([0.5]), ia, ta,
            None, None, jnp.zeros((1, 2 * p, 2 * p, cfg.l2p_in_channels)), 2, 2)
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer"))
                     or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_zimage_checkpoint

            return load_zimage_checkpoint(path, self)
        if path:
            self._refuse("transformer/ dir or single-file checkpoint")
        return self.init_variables(rng)

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        p = self.patch
        img = patchify(noisy_latents, p)
        tm = cond.get("txt_mask")
        lens = (tm.sum(-1).astype(jnp.int32) if tm is not None
                else jnp.full((b,), cond["txt"].shape[1], jnp.int32))
        ia, ta = zimage_pos_angles(self.dit_config, h // p, w // p, lens,
                                   cond["txt"].shape[1])
        out = self.dit.apply(self._dit_colls(variables), img, cond["txt"], t,
                             ia, ta, None, tm, noisy_latents, h // p, w // p)
        return -out  # z_image.py:402 (L2P reuses ZImageModel's negation)

    def encode_images(self, variables, images, rng=None):
        return images

    def decode_latents(self, variables, latents):
        return jnp.clip(latents, -1.0, 1.0)

    def latent_shape(self, height: int, width: int):
        return height, width, self.dit_config.l2p_in_channels

    def image_seq_len(self, height: int, width: int) -> int:
        p = self.patch
        return (height // p) * (width // p)


@register_model
class ZetaChromaModel(_ZImageBase):
    """zeta_chroma: the vendored ZImageDCT — pixel space, 32x32x3 patch
    tokens, DCT decoder head, x0 residual inside the transformer forward
    (zeta_chroma_model.py: FakeVAE scaling 1.0, t_vec = timestep/1000,
    loss target noise - latents, bucket divisibility 32)."""

    arch = "zeta_chroma"
    archs = ["zeta_chroma"]
    bucket_divisibility = 32

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        tiny = config.model_kwargs.get("size", "full") == "tiny"
        if tiny:
            self.patch = 4
            self.dit_config = ZImageConfig.tiny(
                head="dct", text_first=True, use_x0=True, cap_feat_dim=64,
                in_feats=3 * 4 * 4, out_feats=3 * 4 * 4, dct_in_channels=3 * 4 * 4)
        else:
            self.patch = int(config.model_kwargs.get("patch_size", 32))
            in_feats = self.patch * self.patch * 3
            self.dit_config = ZImageConfig(
                head="dct", text_first=True,
                in_feats=in_feats, out_feats=in_feats, dct_in_channels=in_feats,
                use_x0=bool(config.model_kwargs.get("use_x0", True)),
            )
        self.dit = ZImageDiT(self.dit_config)
        self._init_te_tokenizer(tiny)

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_te = jax.random.split(rng)
        cfg = self.dit_config
        ia, ta = zimage_pos_angles(cfg, 2, 2, jnp.asarray([4]), 4)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, cfg.in_feats)),
            jnp.zeros((1, 4, cfg.cap_feat_dim)), jnp.asarray([0.5]), ia, ta)
        # reference zero-inits the DCT final projection (DCTFinalLayer:410-411)
        dparams = dit_vars["params"]
        dparams["dec_net"]["final_linear"] = jax.tree.map(
            jnp.zeros_like, dparams["dec_net"]["final_linear"])
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dparams, "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and os.path.isfile(path):
            from ai_toolkit_tpu.io.dit_importers import load_zeta_checkpoint

            return load_zeta_checkpoint(path, self)
        if path:
            self._refuse("single-file ZImageDCT .safetensors checkpoint")
        return self.init_variables(rng)

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        p = self.patch
        img = patchify(noisy_latents, p)
        tm = cond.get("txt_mask")
        lens = (tm.sum(-1).astype(jnp.int32) if tm is not None
                else jnp.full((b,), cond["txt"].shape[1], jnp.int32))
        ia, ta = zimage_pos_angles(self.dit_config, h // p, w // p, lens,
                                   cond["txt"].shape[1])
        out = self.dit.apply(self._dit_colls(variables), img, cond["txt"], t,
                             ia, ta, None, tm)
        return unpatchify(out, h, w, p)

    # FakeVAE(scaling_factor=1.0): the latents ARE the [-1,1] image
    def encode_images(self, variables, images, rng=None):
        return images

    def decode_latents(self, variables, latents):
        return jnp.clip(latents, -1.0, 1.0)

    def latent_shape(self, height: int, width: int):
        return height, width, 3

    def image_seq_len(self, height: int, width: int) -> int:
        p = self.patch
        return (height // p) * (width // p)
