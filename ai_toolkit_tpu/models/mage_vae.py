"""MageVAE — exact reimplementation of the Mage-Flow autoencoder.

Parity target: the vendored reference
``extensions_built_in/diffusion_models/mageflow/src/vae.py`` (MageVAE =
DConvEncoder + DConvDenoiser-with-CoD-decoder):

- **encode**: a one-step "diffusion" DConvEncoder — 16x patch stem (3->768)
  through 2 plain DiCo blocks, fused with a zero-latent projection, then 21
  adaLN DiCo blocks at t=0, projecting to packed (mean | logvar); sample with
  ``mean + exp(logvar/2) * eps``. Latents are [B, H/16, W/16, 128] with no
  scaling/shift.
- **decode**: the CoD decoder (conv-in -> [Res, 32x32-patched Attn] x2 ->
  Res -> conv-out) turns z into 384-ch conditioning features; the DConv
  denoiser runs at t=0 on a ZERO image — 21 adaLN DiCo blocks over the
  patch-stem+cond fusion, then a per-patch NeRF head (DCT positional
  features, 3 adaLN MLP res-blocks conditioned on the per-patch DiCo state,
  RMS final) emits the pixels of each 16x16 patch.

DiCo block: 1x1 -> depthwise 3x3 -> GELU -> channel attention (global avg
pool -> 1x1 -> sigmoid) -> 1x1, plus a 1x1-expanded GELU MLP, both modulated
by a 6-way adaLN of the timestep vector (constant at t=0 — XLA folds it).

TPU notes: everything NHWC; the 32x32 patched attention uses replicate
padding + window reshape (static shapes per bucket); blocks are a Python
loop (the VAE runs once per image at cache time, not in the train step).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv, GroupNorm, LayerNorm, Linear, RMSNorm


@dataclass(frozen=True)
class MageVAEConfig:
    z_ch: int = 128
    hidden: int = 384
    enc_blocks: int = 21
    patch: int = 16
    mlp_ratio: float = 4.0
    head_size: int = 768
    head_blocks: int = 2
    dec_blocks: int = 24  # total; dec_blocks - dec_cond_blocks = MLP res blocks
    dec_cond_blocks: int = 21
    hidden_x: int = 32
    max_freqs: int = 8
    attn_patch: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def downscale(self) -> int:
        return self.patch

    @property
    def latent_channels(self) -> int:
        return self.z_ch

    @classmethod
    def tiny(cls) -> "MageVAEConfig":
        return cls(z_ch=6, hidden=16, enc_blocks=2, patch=4, head_size=24,
                   head_blocks=1, dec_blocks=4, dec_cond_blocks=3, hidden_x=8,
                   max_freqs=2, attn_patch=4, dtype=jnp.float32)


def _timestep_embedding(t: jax.Array, dim: int, max_period: float = 10_000.0):
    """DConv TimestepEmbedder: [cos | sin] halves."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _TimestepEmbedder(nn.Module):
    hidden: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, t):
        emb = _timestep_embedding(t, 256).astype(self.dtype)
        h = Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="in_layer")(emb)
        return Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="out_layer")(nn.silu(h))


class _ChannelAttention(nn.Module):
    ch: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = Conv(self.ch, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
                 name="conv")(p)
        return x * jax.nn.sigmoid(p)


class DiCoBlock(nn.Module):
    """adaLN-modulated DConv block (vae.py:120-161)."""

    ch: int
    mlp_ratio: float
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, c):
        dt, pdt = self.dtype, self.param_dtype
        mod = Linear(6 * self.ch, dtype=dt, param_dtype=pdt, name="adaln")(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [
            m[:, None, None, :] for m in jnp.split(mod, 6, axis=-1)
        ]
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm1")(x)
        h = h * (1 + sc_a) + sh_a
        h = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv1")(h)
        h = nn.gelu(
            Conv(self.ch, (3, 3), groups=self.ch, dtype=dt, param_dtype=pdt,
                 name="conv2")(h),
            approximate=False,
        )
        h = _ChannelAttention(self.ch, dt, pdt, name="ca")(h)
        h = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv3")(h)
        x = x + g_a * h
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm2")(x)
        h = h * (1 + sc_m) + sh_m
        h = nn.gelu(
            Conv(int(self.mlp_ratio * self.ch), (1, 1), dtype=dt, param_dtype=pdt,
                 name="conv4")(h),
            approximate=False,
        )
        return x + g_m * Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv5")(h)


class EncoderDiCoBlock(nn.Module):
    """Unmodulated DiCo block with AFFINE norms (vae.py:164-191)."""

    ch: int
    mlp_ratio: float
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, pdt = self.dtype, self.param_dtype
        h = LayerNorm(dtype=dt, param_dtype=pdt, name="norm1")(x)
        h = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv1")(h)
        h = nn.gelu(
            Conv(self.ch, (3, 3), groups=self.ch, dtype=dt, param_dtype=pdt,
                 name="conv2")(h),
            approximate=False,
        )
        h = _ChannelAttention(self.ch, dt, pdt, name="ca")(h)
        x = x + Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv3")(h)
        h = LayerNorm(dtype=dt, param_dtype=pdt, name="norm2")(x)
        h = nn.gelu(
            Conv(int(self.mlp_ratio * self.ch), (1, 1), dtype=dt, param_dtype=pdt,
                 name="conv4")(h),
            approximate=False,
        )
        return x + Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv5")(h)


class MageEncoder(nn.Module):
    """_DConvEncoder at t=0, z_t=0: image -> packed (mean | logvar)."""

    cfg: MageVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        b = x.shape[0]
        cond = Conv(cfg.head_size, (cfg.patch, cfg.patch), (cfg.patch, cfg.patch),
                    "VALID", dtype=dt, param_dtype=pdt, name="patch_cond_embed")(
            x.astype(dt))
        for i in range(cfg.head_blocks):
            cond = EncoderDiCoBlock(cfg.head_size, cfg.mlp_ratio, dt, pdt,
                                    name=f"head_block_{i}")(cond)
        cond = Conv(cfg.hidden, (1, 1), dtype=dt, param_dtype=pdt, name="proj_down")(cond)
        z_t = jnp.zeros(cond.shape[:3] + (cfg.z_ch,), dt)
        z = Conv(cfg.hidden, (1, 1), dtype=dt, param_dtype=pdt, name="z_proj")(z_t)
        s = Conv(cfg.hidden, (1, 1), dtype=dt, param_dtype=pdt, name="fuse_proj")(
            jnp.concatenate([cond, z], axis=-1)
        )
        c = _TimestepEmbedder(cfg.hidden, dt, pdt, name="t_embed")(jnp.zeros((b,)))
        for i in range(cfg.enc_blocks):
            s = DiCoBlock(cfg.hidden, cfg.mlp_ratio, dt, pdt, name=f"block_{i}")(s, c)
        s = LayerNorm(dtype=dt, param_dtype=pdt, name="norm_out")(s)
        return Conv(2 * cfg.z_ch, (1, 1), dtype=dt, param_dtype=pdt, name="proj_out")(s)


class _PatchedAttnBlock(nn.Module):
    """32x32-window spatial self-attention with replicate pad (vae.py:316-368)."""

    ch: int
    window: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, pdt = self.dtype, self.param_dtype
        h = GroupNorm(32, dtype=dt, param_dtype=pdt, name="norm")(x)
        q = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="q")(h)
        k = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="k")(h)
        v = Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="v")(h)
        b, hh, ww, c = q.shape
        d = self.window
        ph, pw = (d - hh % d) % d, (d - ww % d) % d
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            q = jnp.pad(q, pad, mode="edge")
            k = jnp.pad(k, pad, mode="edge")
            v = jnp.pad(v, pad, mode="edge")
        hp, wp = hh + ph, ww + pw

        def windows(t):
            t = t.reshape(b, hp // d, d, wp // d, d, c)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, d * d, c)

        qw, kw, vw = windows(q), windows(k), windows(v)
        logits = jnp.einsum(
            "bic,bjc->bij", qw.astype(jnp.float32), kw.astype(jnp.float32)
        ) * (c ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, vw.astype(jnp.float32)).astype(dt)
        out = out.reshape(b, hp // d, wp // d, d, d, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :hh, :ww]
        return x + Conv(self.ch, (1, 1), dtype=dt, param_dtype=pdt, name="proj_out")(out)


class _ResnetBlock(nn.Module):
    ch: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, pdt = self.dtype, self.param_dtype
        h = nn.silu(GroupNorm(32, dtype=dt, param_dtype=pdt, name="norm1")(x))
        h = Conv(self.ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv1")(h)
        h = nn.silu(GroupNorm(32, dtype=dt, param_dtype=pdt, name="norm2")(h))
        return x + Conv(self.ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv2")(h)


class CoDDecoder(nn.Module):
    """latent -> 384-ch conditioning features (vae.py:408-428)."""

    cfg: MageVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        ch = cfg.hidden
        h = Conv(ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv_in")(z.astype(dt))
        h = _ResnetBlock(ch, dt, pdt, name="res_0")(h)
        h = _PatchedAttnBlock(ch, cfg.attn_patch, dt, pdt, name="attn_1")(h)
        h = _ResnetBlock(ch, dt, pdt, name="res_2")(h)
        h = _PatchedAttnBlock(ch, cfg.attn_patch, dt, pdt, name="attn_3")(h)
        h = _ResnetBlock(ch, dt, pdt, name="res_4")(h)
        h = nn.silu(GroupNorm(32, dtype=dt, param_dtype=pdt, name="norm_out")(h))
        return Conv(ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv_out")(h)


def _dct_table(patch: int, max_freqs: int) -> np.ndarray:
    """NerfEmbedder.fetch_pos: [patch^2, max_freqs^2] DCT features."""
    pos = np.linspace(0.0, 1.0, patch)
    pos_y, pos_x = np.meshgrid(pos, pos, indexing="ij")
    pos_x = pos_x.reshape(-1, 1, 1)
    pos_y = pos_y.reshape(-1, 1, 1)
    freqs = np.linspace(0.0, max_freqs, max_freqs)
    fx = freqs[None, :, None]
    fy = freqs[None, None, :]
    coeffs = (1.0 + fx * fy) ** -1
    dct = np.cos(pos_x * fx * np.pi) * np.cos(pos_y * fy * np.pi) * coeffs
    return dct.reshape(patch * patch, max_freqs * max_freqs).astype(np.float32)


class _MLPResBlock(nn.Module):
    ch: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, y):
        dt, pdt = self.dtype, self.param_dtype
        mod = Linear(3 * self.ch, dtype=dt, param_dtype=pdt, name="adaln")(nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = LayerNorm(dtype=dt, param_dtype=pdt, name="in_ln")(x) * (1 + scale) + shift
        h = Linear(self.ch, dtype=dt, param_dtype=pdt, name="mlp_in")(h)
        h = Linear(self.ch, dtype=dt, param_dtype=pdt, name="mlp_out")(nn.silu(h))
        return x + gate * h


class MageDenoiser(nn.Module):
    """_DConvDenoiser decode pass at t=0 on a zero image (vae.py:496-571)."""

    cfg: MageVAEConfig

    @nn.compact
    def __call__(self, cond):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, gh, gw, _ = cond.shape
        p, hx = cfg.patch, cfg.hidden_x
        c = _TimestepEmbedder(cfg.hidden, dt, pdt, name="t_embed")(jnp.zeros((b,)))

        # s pathway: patch stem of the ZERO image contributes only proj2's
        # transform of [0-image-features | cond]
        zero_feat = jnp.zeros((b, gh, gw, cfg.z_ch), dt)  # proj1(zeros) == 0
        s = Conv(cfg.hidden, (1, 1), dtype=dt, param_dtype=pdt, name="s_proj2")(
            jnp.concatenate([zero_feat, cond], axis=-1)
        )
        for i in range(cfg.dec_cond_blocks):
            s = DiCoBlock(cfg.hidden, cfg.mlp_ratio, dt, pdt, name=f"block_{i}")(s, c)
        s_tok = s.reshape(b * gh * gw, cfg.hidden)

        # x pathway: per-patch tokens [zero image (3) | cond features (hx) | DCT]
        y_x = Conv(hx * p * p, (1, 1), dtype=dt, param_dtype=pdt, name="y_embedder_x")(cond)
        y_x = y_x.reshape(b, gh, gw, hx, p * p).transpose(0, 1, 2, 4, 3)
        y_x = y_x.reshape(b * gh * gw, p * p, hx)
        zeros_img = jnp.zeros((b * gh * gw, p * p, 3), dt)
        dct = jnp.asarray(_dct_table(p, cfg.max_freqs), dt)
        tokens = jnp.concatenate(
            [zeros_img, y_x, jnp.broadcast_to(dct[None], (b * gh * gw, p * p, dct.shape[-1]))],
            axis=-1,
        )
        x = Linear(hx, dtype=dt, param_dtype=pdt, name="x_embedder")(tokens)

        # dec_net: SimpleMLPAdaLN conditioned on the per-patch DiCo state
        x = Linear(hx, dtype=dt, param_dtype=pdt, name="input_proj")(x)
        y = Linear(p * p * hx, dtype=dt, param_dtype=pdt, name="cond_embed")(s_tok)
        y = y.reshape(b * gh * gw, p * p, hx)
        for i in range(cfg.dec_blocks - cfg.dec_cond_blocks):
            x = _MLPResBlock(hx, dt, pdt, name=f"res_{i}")(x, y)
        x = RMSNorm(dtype=dt, param_dtype=pdt, name="final_norm")(x)
        x = Linear(3, dtype=dt, param_dtype=pdt, name="final_linear")(x)

        # fold tokens (row-major ph, pw) back to the image
        x = x.reshape(b, gh, gw, p, p, 3)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, 3)


class MageVAE(nn.Module):
    """encode/decode API-compatible with AutoencoderKL (no scaling factors)."""

    cfg: MageVAEConfig

    def setup(self):
        self.encoder = MageEncoder(self.cfg)
        self.cod = CoDDecoder(self.cfg)
        self.denoiser = MageDenoiser(self.cfg)

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        out = self.encoder(x)
        mean, logvar = jnp.split(out, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar.astype(jnp.float32), -20.0, 10.0)
            mean = mean + (
                jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
            ).astype(mean.dtype)
        return mean

    def decode(self, z: jax.Array) -> jax.Array:
        return self.denoiser(self.cod(z))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
