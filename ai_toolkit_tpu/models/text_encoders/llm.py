"""Decoder-LLM text encoders (Llama / Gemma2 / Qwen2.5 families).

Several reference archs condition on hidden states of a causal LLM rather
than CLIP/T5: qwen_image uses Qwen2.5-VL's text tower
(``/root/reference/extensions_built_in/diffusion_models/qwen_image/qwen_image.py:148-196``),
hidream feeds Llama-3.1-8B per-layer hidden states to every block
(``extensions_built_in/diffusion_models/hidream/hidream_model.py``), and
lumina2 uses Gemma2-2B (``toolkit/stable_diffusion_model.py`` is_lumina2 path).

One Flax module covers the family: token embedding -> N pre-norm decoder
layers (GQA attention with RoPE + SwiGLU MLP) -> final RMSNorm, with the
small per-family deltas expressed as config flags:

- ``qkv_bias``      — Qwen2 adds biases to q/k/v projections.
- ``post_norms``    — Gemma2 adds post-attention/post-MLP RMSNorms and
                      scales embeddings by sqrt(d_model).
- ``gemma_gelu``    — Gemma2 uses GELU-tanh gating instead of SiLU.
- ``collect_layers``— return hidden states after the listed layers stacked
                      on a leading axis (hidream consumes one per block).
- ``all_bias``      — Ernie4.5 ``use_bias``: biases on every linear
                      (q/k/v/o and gate/up/down).
- ``rope_interleaved`` — Ernie4.5/GPT-J rope: adjacent pairs (x2i, x2i+1)
                      rotated by angle θi instead of the llama half-split.

TPU notes: the whole stack is static-shape; attention is one fused
dot_product_attention with a causal+padding mask; GQA KV heads are
broadcast with a reshape (no gather).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm


@dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 128256
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    d_ff: int = 14336
    rope_theta: float = 500_000.0
    qkv_bias: bool = False
    post_norms: bool = False
    gemma_gelu: bool = False
    # Gemma2 multiplies token embeddings by sqrt(d_model)
    scale_embeddings: bool = False
    collect_layers: tuple[int, ...] = ()
    # HF rms_norm_eps (llama 1e-5; gemma2/qwen2.5 1e-6)
    rms_eps: float = 1e-5
    # Gemma2 attention-logit softcapping (0 = off) and explicit query scale
    # (query_pre_attn_scalar**-0.5; None = 1/sqrt(head_dim))
    attn_softcap: float = 0.0
    query_scale: float | None = None
    # Qwen3(-VL): per-head RMSNorm on q/k before rope (HF q_norm/k_norm)
    qk_head_norm: bool = False
    # Ernie4.5: use_bias on all linears; interleaved (GPT-J-style) rope
    all_bias: bool = False
    rope_interleaved: bool = False
    # GLM-4: rope over only the first partial_rotary*head_dim dims
    # (transformers modeling_glm: interleaved rotate_half, q_pass untouched)
    partial_rotary: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def llama31_8b(cls) -> "LLMConfig":
        return cls()

    @classmethod
    def gemma2_2b(cls) -> "LLMConfig":
        return cls(
            vocab_size=256_000, d_model=2304, n_layers=26, n_heads=8, n_kv_heads=4,
            head_dim=256, d_ff=9216, rope_theta=10_000.0, post_norms=True,
            gemma_gelu=True, scale_embeddings=True, rms_eps=1e-6,
            attn_softcap=50.0, query_scale=256.0 ** -0.5,
        )

    @classmethod
    def qwen25_7b(cls) -> "LLMConfig":
        return cls(
            vocab_size=152_064, d_model=3584, n_layers=28, n_heads=28, n_kv_heads=4,
            head_dim=128, d_ff=18944, rope_theta=1_000_000.0, qkv_bias=True,
            rms_eps=1e-6,
        )

    @classmethod
    def qwen3_2b(cls) -> "LLMConfig":
        """Qwen3-1.7B-class text tower (the PRX pixel TE family): hidden 2048,
        GQA 16/8, per-head qk norms, no qkv bias. Real dims come from the
        checkpoint's text_encoder/config.json at import time."""
        return cls(
            vocab_size=151_936, d_model=2048, n_layers=28, n_heads=16, n_kv_heads=8,
            head_dim=128, d_ff=6144, rope_theta=1_000_000.0, rms_eps=1e-6,
            qk_head_norm=True,
        )

    @classmethod
    def ernie45(cls) -> "LLMConfig":
        """Ernie-4.5 dense text tower (the ernie_image TE: AutoModel over the
        checkpoint's text_encoder/, hidden 2560 per the transformer's
        text_in_dim). Llama-family with ``use_bias`` linears, interleaved
        rope, tied embeddings; real dims come from text_encoder/config.json
        at import time (``modeling_ernie4_5.py``)."""
        return cls(
            vocab_size=103_424, d_model=2560, n_layers=28, n_heads=20,
            n_kv_heads=4, head_dim=128, d_ff=12_288, rope_theta=500_000.0,
            rms_eps=1e-5, rope_interleaved=True,
        )

    @classmethod
    def glm4_9b(cls) -> "LLMConfig":
        """GLM-4-9B text tower (cogview4's TE; transformers ``GlmModel``):
        qkv biases, swiglu with fused gate_up (split at import by
        ``io/dit_importers.glm_split_fused``), interleaved rope over the
        first half of each head (partial_rotary_factor 0.5)."""
        return cls(
            vocab_size=151_552, d_model=4096, n_layers=40, n_heads=32,
            n_kv_heads=2, head_dim=128, d_ff=13_696, rope_theta=10_000.0,
            qkv_bias=True, rms_eps=1.5625e-07, rope_interleaved=True,
            partial_rotary=0.5,
        )

    @classmethod
    def tiny(cls, **kw) -> "LLMConfig":
        base = dict(
            vocab_size=1000, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
            head_dim=16, d_ff=128, dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


def _llm_rope(x: jax.Array, theta: float) -> jax.Array:
    """Standard half-split RoPE (llama layout). x: [B, S, H, D]."""
    b, s, h, d = x.shape
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = jnp.arange(s, dtype=jnp.float32)[:, None] * freqs[None, :]  # [S, D/2]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


def _llm_rope_interleaved(x: jax.Array, theta: float) -> jax.Array:
    """GPT-J / Ernie4.5 rope: pair (x2i, x2i+1) rotated by θi
    (``modeling_ernie4_5.py`` apply_rotary_pos_emb: cos repeat_interleave(2),
    rotate_half = stack((-x[1::2], x[0::2]))). x: [B, S, H, D]."""
    b, s, h, d = x.shape
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = jnp.arange(s, dtype=jnp.float32)[:, None] * freqs[None, :]  # [S, D/2]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    xe, xo = x[..., 0::2].astype(jnp.float32), x[..., 1::2].astype(jnp.float32)
    oe = xe * cos - xo * sin
    oo = xo * cos + xe * sin
    return jnp.stack([oe, oo], axis=-1).reshape(b, s, h, d).astype(x.dtype)


class LLMLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dt = cfg.dtype
        b, s, _ = x.shape
        nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

        qkv_bias = cfg.qkv_bias or cfg.all_bias
        h = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="input_norm")(x)
        q = Linear(nh * hd, use_bias=qkv_bias, dtype=dt, param_dtype=dt, name="q")(h)
        k = Linear(nkv * hd, use_bias=qkv_bias, dtype=dt, param_dtype=dt, name="k")(h)
        v = Linear(nkv * hd, use_bias=qkv_bias, dtype=dt, param_dtype=dt, name="v")(h)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        if cfg.qk_head_norm:
            # Qwen3: RMSNorm over head_dim on each q/k head, before rope
            q = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="q_norm")(q)
            k = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="k_norm")(k)
        rope = _llm_rope_interleaved if cfg.rope_interleaved else _llm_rope
        if cfg.partial_rotary < 1.0:
            rd = int(hd * cfg.partial_rotary)
            q = jnp.concatenate([rope(q[..., :rd], cfg.rope_theta), q[..., rd:]], axis=-1)
            k = jnp.concatenate([rope(k[..., :rd], cfg.rope_theta), k[..., rd:]], axis=-1)
        else:
            q = rope(q, cfg.rope_theta)
            k = rope(k, cfg.rope_theta)
        v = v.reshape(b, s, nkv, hd)
        if nkv != nh:  # GQA: repeat kv heads
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        if cfg.attn_softcap:
            # Gemma2: softmax(cap * tanh(qk*scale / cap)) — jax.nn attention
            # has no softcap hook, so this path is an explicit einsum
            scale = cfg.query_scale if cfg.query_scale is not None else hd ** -0.5
            logits = jnp.einsum(
                "bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * scale
            cap = cfg.attn_softcap
            logits = cap * jnp.tanh(logits / cap)
            logits = jnp.where(mask, logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
            attn = attn.astype(dt).reshape(b, s, nh * hd)
        else:
            attn = dot_product_attention(
                q, k, v, mask=mask, scale=cfg.query_scale
            ).reshape(b, s, nh * hd)
        attn = Linear(cfg.d_model, use_bias=cfg.all_bias, dtype=dt, param_dtype=dt, name="o")(attn)
        if cfg.post_norms:
            attn = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="post_attn_norm")(attn)
        x = x + attn

        h = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="pre_mlp_norm")(x)
        gate = Linear(cfg.d_ff, use_bias=cfg.all_bias, dtype=dt, param_dtype=dt, name="gate")(h)
        up = Linear(cfg.d_ff, use_bias=cfg.all_bias, dtype=dt, param_dtype=dt, name="up")(h)
        act = jax.nn.gelu(gate, approximate=True) if cfg.gemma_gelu else jax.nn.silu(gate)
        mlp = Linear(cfg.d_model, use_bias=cfg.all_bias, dtype=dt, param_dtype=dt, name="down")(act * up)
        if cfg.post_norms:
            mlp = RMSNorm(eps=cfg.rms_eps, dtype=dt, name="post_mlp_norm")(mlp)
        return x + mlp


class LLMEncoder(nn.Module):
    """Causal LM used as a text encoder: returns hidden states, no LM head."""

    cfg: LLMConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attn_mask: jax.Array | None = None,
                 prefix_embeds: jax.Array | None = None,
                 return_logits: bool = False):
        """prefix_embeds [B, P, d]: soft tokens (e.g. projected vision patches,
        LLaVA-style) prepended before the token embeddings; return_logits adds
        tied-embedding LM logits (the captioner's decode head)."""
        cfg = self.cfg
        b, s = input_ids.shape
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.d_model),
            jnp.float32,
        )
        x = emb[input_ids].astype(cfg.dtype)
        if cfg.scale_embeddings:
            x = x * jnp.sqrt(float(cfg.d_model)).astype(cfg.dtype)
        if prefix_embeds is not None:
            x = jnp.concatenate([prefix_embeds.astype(cfg.dtype), x], axis=1)
            if attn_mask is not None:
                attn_mask = jnp.concatenate(
                    [jnp.ones((b, prefix_embeds.shape[1]), attn_mask.dtype), attn_mask],
                    axis=1)
            s = x.shape[1]

        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attn_mask is not None:
            causal = causal & attn_mask[:, None, None, :].astype(bool)
        mask = jnp.broadcast_to(causal, (b, 1, s, s))

        collected = []
        for i in range(cfg.n_layers):
            x = LLMLayer(cfg, name=f"layer_{i}")(x, mask)
            if i in cfg.collect_layers:
                collected.append(x)
        x = RMSNorm(eps=cfg.rms_eps, dtype=cfg.dtype, name="final_norm")(x)
        if return_logits:
            # tied-embedding head (llama/qwen small models tie lm_head)
            return jnp.einsum("bsd,vd->bsv", x.astype(jnp.float32),
                              emb.astype(jnp.float32))
        if cfg.collect_layers:
            return {"last_hidden_state": x, "collected": jnp.stack(collected, axis=0)}
        return x
