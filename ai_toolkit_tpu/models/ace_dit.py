"""Exact ACE-Step 1.5 transformer stack.

Parity target: the reference's vendored AIO-format model
(``/root/reference/extensions_built_in/audio_models/ace_step/src/model.py``):

- ``AceDiT`` == ``DiTModel`` (model.py:767-855): patchified Conv1d in/out,
  GQA attention with per-head q/k RMSNorm, rotary base 1e6 (half-rotate),
  alternating sliding-window (128) / full self-attention, unmodulated
  cross-attention to the condition stream, 6-way adaLN scale_shift_table
  per layer + a 2-way output table, dual timestep embeddings (t and t - r,
  summed).
- ``ConditionEncoder`` == model.py:724-763: text projector + LyricEncoder
  (8 pre-norm GQA layers) + TimbreEncoder (4 layers, CLS token readout),
  mask-packed into one condition sequence (``pack_sequences``).
- The input is channel-concat [context(src latents + chunk masks), noisy]
  (in_ch = 192 for the released 1.5 checkpoint).

Everything computes in f32 inside the modules (golden-tested against a torch
mirror at f32); callers cast params/activations as usual.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Linear


@dataclass(frozen=True)
class AceConfig:
    hidden: int = 2048
    text_dim: int = 1024
    timbre_dim: int = 64
    out_ch: int = 64
    in_ch: int = 192
    n_dit: int = 24
    n_lyric: int = 8
    n_timbre: int = 4
    heads: int = 16
    kv: int = 8
    head_dim: int = 128
    inter: int = 6144
    patch: int = 2
    sliding_window: int = 128
    eps: float = 1e-6
    # XL checkpoints size the condition encoder differently
    enc_hidden: int | None = None
    enc_heads: int | None = None
    enc_kv: int | None = None
    enc_inter: int | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def eh(self):
        return self.enc_hidden or self.hidden

    @classmethod
    def ace15(cls) -> "AceConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "AceConfig":
        return cls(hidden=32, text_dim=16, timbre_dim=8, out_ch=4, in_ch=12,
                   n_dit=2, n_lyric=1, n_timbre=1, heads=2, kv=1, head_dim=16,
                   inter=64, sliding_window=4)


class AceRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones_init(), (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y * w).astype(x.dtype)


def ace_rope(seq_len: int, head_dim: int, base: float = 1_000_000.0):
    """cos/sin tables [L, head_dim]; full-dim duplication (cat(freqs, freqs))."""
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply_rotary(q, k, cos, sin):
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


class AceAttention(nn.Module):
    """GQA with per-head q/k RMSNorm (model.py:547-609). [B, L, heads*hd]."""

    cfg: AceConfig
    hidden: int
    heads: int
    kv: int
    is_cross: bool = False
    sliding_window: int | None = None

    @nn.compact
    def __call__(self, x, enc=None, rope=None):
        cfg = self.cfg
        hd = cfg.head_dim
        b, l, _ = x.shape
        dense = lambda f, name: Linear(f, use_bias=False, dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)
        q = dense(self.heads * hd, "q_proj")(x).reshape(b, l, self.heads, hd)
        src = enc if (self.is_cross and enc is not None) else x
        sl = src.shape[1]
        k = dense(self.kv * hd, "k_proj")(src).reshape(b, sl, self.kv, hd)
        v = dense(self.kv * hd, "v_proj")(src).reshape(b, sl, self.kv, hd)
        q = AceRMSNorm(hd, cfg.eps, name="q_norm")(q)
        k = AceRMSNorm(hd, cfg.eps, name="k_norm")(k)
        if rope is not None and not (self.is_cross and enc is not None):
            cos, sin = rope
            q, k = _apply_rotary(q, k, cos[:l], sin[:l])
        rep = self.heads // self.kv
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("blhd,bshd->bhls", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(hd)
        if self.sliding_window is not None and not self.is_cross:
            idx = jnp.arange(l)
            in_win = jnp.abs(idx[:, None] - idx[None, :]) <= self.sliding_window
            logits = jnp.where(in_win[None, None], logits, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", p, v.astype(jnp.float32))
        out = out.reshape(b, l, self.heads * hd).astype(x.dtype)
        return dense(self.hidden, "o_proj")(out)


class AceMLP(nn.Module):
    cfg: AceConfig
    hidden: int
    inter: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda f, name: Linear(f, use_bias=False, dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)
        return dense(self.hidden, "down_proj")(
            jax.nn.silu(dense(self.inter, "gate_proj")(x)) * dense(self.inter, "up_proj")(x)
        )


class AceEncoderLayer(nn.Module):
    cfg: AceConfig
    hidden: int
    heads: int
    kv: int
    inter: int

    @nn.compact
    def __call__(self, x, rope):
        cfg = self.cfg
        x = x + AceAttention(cfg, self.hidden, self.heads, self.kv, name="self_attn")(
            AceRMSNorm(self.hidden, cfg.eps, name="input_layernorm")(x), rope=rope
        )
        x = x + AceMLP(cfg, self.hidden, self.inter, name="mlp")(
            AceRMSNorm(self.hidden, cfg.eps, name="post_attention_layernorm")(x)
        )
        return x


class AceDiTLayer(nn.Module):
    cfg: AceConfig
    sliding_window: int | None

    @nn.compact
    def __call__(self, x, tproj, enc, rope):
        cfg = self.cfg
        table = self.param("scale_shift_table", nn.initializers.zeros_init(),
                           (1, 6, cfg.hidden), jnp.float32)
        mods = (table + tproj.astype(jnp.float32)).astype(x.dtype)  # [B, 6, h]
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = [
            mods[:, i : i + 1] for i in range(6)
        ]
        h = AceRMSNorm(cfg.hidden, cfg.eps, name="self_attn_norm")(x) * (1 + sc_msa) + s_msa
        x = x + AceAttention(cfg, cfg.hidden, cfg.heads, cfg.kv,
                             sliding_window=self.sliding_window, name="self_attn")(
            h, rope=rope) * g_msa
        x = x + AceAttention(cfg, cfg.hidden, cfg.heads, cfg.kv, is_cross=True,
                             name="cross_attn")(
            AceRMSNorm(cfg.hidden, cfg.eps, name="cross_attn_norm")(x), enc=enc)
        h = AceRMSNorm(cfg.hidden, cfg.eps, name="mlp_norm")(x) * (1 + sc_mlp) + s_mlp
        x = x + AceMLP(cfg, cfg.hidden, cfg.inter, name="mlp")(h) * g_mlp
        return x


def _ace_time_embedding(t: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[cos | sin] sincos (model.py:512-523 — cos FIRST, unlike DDPM utils)."""
    t = t.astype(jnp.float32) * scale
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class AceTimestepEmbed(nn.Module):
    cfg: AceConfig

    @nn.compact
    def __call__(self, t):
        cfg = self.cfg
        dense = lambda f, name: Linear(f, dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)
        emb = _ace_time_embedding(t, 256).astype(cfg.dtype)
        temb = dense(cfg.hidden, "linear_1")(emb)
        temb = dense(cfg.hidden, "linear_2")(jax.nn.silu(temb))
        proj = dense(cfg.hidden * 6, "time_proj")(jax.nn.silu(temb))
        return temb, proj.reshape(-1, 6, cfg.hidden)


class AceDiT(nn.Module):
    """The decoder DiT (model.py:767-855). Input x [B, T, out_ch] noisy
    latents; context [B, T, in_ch - out_ch]; enc_h [B, S, eh]."""

    cfg: AceConfig

    @nn.compact
    def __call__(self, x, timestep, timestep_r, enc_h, context):
        cfg = self.cfg
        temb_t, proj_t = AceTimestepEmbed(cfg, name="time_embed")(timestep)
        temb_r, proj_r = AceTimestepEmbed(cfg, name="time_embed_r")(
            timestep - timestep_r
        )
        temb = temb_t + temb_r
        tproj = proj_t + proj_r

        h = jnp.concatenate([context, x], axis=-1)  # [B, T, in_ch]
        orig_len = h.shape[1]
        pad = (-orig_len) % cfg.patch
        if pad:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        # Conv1d(in_ch, hidden, k=p, s=p) == patchify matmul
        b, tt, c = h.shape
        h = h.reshape(b, tt // cfg.patch, cfg.patch * c)
        kernel = self.param(
            "proj_in_kernel", nn.initializers.lecun_normal(),
            (cfg.patch * c, cfg.hidden), cfg.param_dtype,
        )
        bias = self.param("proj_in_bias", nn.initializers.zeros_init(),
                          (cfg.hidden,), cfg.param_dtype)
        h = h.astype(cfg.dtype) @ kernel.astype(cfg.dtype) + bias.astype(cfg.dtype)

        enc = Linear(cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="condition_embedder")(enc_h)
        rope = ace_rope(h.shape[1], cfg.head_dim)
        for i in range(cfg.n_dit):
            sw = cfg.sliding_window if i % 2 == 0 else None
            h = AceDiTLayer(cfg, sw, name=f"layers_{i}")(h, tproj, enc, rope)

        table = self.param("scale_shift_table", nn.initializers.zeros_init(),
                           (1, 2, cfg.hidden), jnp.float32)
        mods = (table + temb.astype(jnp.float32)[:, None]).astype(h.dtype)
        shift, scale = mods[:, 0:1], mods[:, 1:2]
        h = AceRMSNorm(cfg.hidden, cfg.eps, name="norm_out")(h) * (1 + scale) + shift
        # ConvTranspose1d(hidden, out_ch, k=p, s=p) == unpatchify matmul
        kernel_o = self.param(
            "proj_out_kernel", nn.initializers.lecun_normal(),
            (cfg.hidden, cfg.patch * cfg.out_ch), cfg.param_dtype,
        )
        bias_o = self.param("proj_out_bias", nn.initializers.zeros_init(),
                            (cfg.patch * cfg.out_ch,), cfg.param_dtype)
        h = h @ kernel_o.astype(h.dtype) + bias_o.astype(h.dtype)
        h = h.reshape(b, tt, cfg.out_ch)
        return h[:, :orig_len]


class AceLyricEncoder(nn.Module):
    cfg: AceConfig

    @nn.compact
    def __call__(self, embeds):
        cfg = self.cfg
        x = Linear(cfg.eh, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   name="embed_tokens")(embeds)
        rope = ace_rope(x.shape[1], cfg.head_dim)
        for i in range(cfg.n_lyric):
            x = AceEncoderLayer(cfg, cfg.eh, cfg.enc_heads or cfg.heads,
                                cfg.enc_kv or cfg.kv, cfg.enc_inter or cfg.inter,
                                name=f"layers_{i}")(x, rope)
        return AceRMSNorm(cfg.eh, cfg.eps, name="norm")(x)


class AceTimbreEncoder(nn.Module):
    """Packed reference-clip encoder; CLS (position 0) readout per clip
    (model.py:686-722). Input [N, L, timbre_dim] -> [N, eh]."""

    cfg: AceConfig

    @nn.compact
    def __call__(self, packed):
        cfg = self.cfg
        # special_token exists in the checkpoint (prepended by the pipeline
        # when building `packed`); keep the param for import parity
        self.param("special_token", nn.initializers.zeros_init(),
                   (1, 1, cfg.eh), jnp.float32)
        x = Linear(cfg.eh, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   name="embed_tokens")(packed)
        rope = ace_rope(x.shape[1], cfg.head_dim)
        for i in range(cfg.n_timbre):
            x = AceEncoderLayer(cfg, cfg.eh, cfg.enc_heads or cfg.heads,
                                cfg.enc_kv or cfg.kv, cfg.enc_inter or cfg.inter,
                                name=f"layers_{i}")(x, rope)
        x = AceRMSNorm(cfg.eh, cfg.eps, name="norm")(x)
        return x[:, 0, :]


def pack_sequences(h1, h2, m1, m2):
    """Concat + stable sort-by-mask compaction (model.py:498-510)."""
    h = jnp.concatenate([h1, h2], axis=1)
    if m1 is None or m2 is None:
        return h, None
    m = jnp.concatenate([m1, m2], axis=1).astype(jnp.int32)
    b, l, d = h.shape
    idx = jnp.argsort(-m, axis=1, stable=True)
    h = jnp.take_along_axis(h, idx[..., None], axis=1)
    lengths = m.sum(axis=1)
    new_m = jnp.arange(l)[None, :] < lengths[:, None]
    return h, new_m


class AceConditionEncoder(nn.Module):
    cfg: AceConfig

    @nn.compact
    def __call__(self, text_h, text_m, lyric_h, lyric_m, timbre_cls, timbre_m):
        """timbre_cls: [B, R, eh] per-batch unpacked CLS embeddings (the
        host unpacks the reference's order_mask loop)."""
        cfg = self.cfg
        text_proj = Linear(cfg.eh, use_bias=False, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="text_projector")(text_h)
        lyric_enc = AceLyricEncoder(cfg, name="lyric_encoder")(lyric_h)
        merged, merged_m = pack_sequences(lyric_enc, timbre_cls, lyric_m, timbre_m)
        final, final_m = pack_sequences(merged, text_proj, merged_m, text_m)
        return final, final_m


class AceStep15(nn.Module):
    cfg: AceConfig

    def setup(self):
        self.decoder = AceDiT(self.cfg, name="decoder")
        self.encoder = AceConditionEncoder(self.cfg, name="encoder")
        self.null_condition_emb = self.param(
            "null_condition_emb", nn.initializers.zeros_init(),
            (1, 1, self.cfg.eh), jnp.float32,
        )

    def __call__(self, x, timestep, timestep_r, enc_h, context):
        return self.decoder(x, timestep, timestep_r, enc_h, context)

    def encode_condition(self, text_h, text_m, lyric_h, lyric_m, timbre_cls, timbre_m):
        return self.encoder(text_h, text_m, lyric_h, lyric_m, timbre_cls, timbre_m)
