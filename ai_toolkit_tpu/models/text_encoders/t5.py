"""T5 encoder stack (FLUX / SD3-class text conditioning).

Own Flax implementation of the T5 v1.1 encoder: RMSNorm (no bias, no mean
subtraction), relative position bias on layer 0 shared across layers, gated
GELU FFN, no absolute position embeddings. Config presets for t5-xxl (FLUX)
and a tiny test size.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    # UMT5 (wan's umt5-xxl): every layer has its OWN relative-bias table
    # (transformers UMT5EncoderModel) instead of sharing layer 0's
    per_layer_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=1000, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4,
                   dtype=jnp.float32)


def _relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Layer(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, buckets=None):
        cfg = self.cfg
        dt = cfg.dtype
        b, s, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        if cfg.per_layer_bias:
            rel = self.param(
                "relative_attention_bias", nn.initializers.normal(0.4),
                (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32,
            )
            pos_bias = rel[buckets].transpose(2, 0, 1)[None]
        h = RMSNorm(dtype=dt, name="ln1")(x)
        q = Linear(inner, use_bias=False, dtype=dt, param_dtype=dt, name="q")(h)
        k = Linear(inner, use_bias=False, dtype=dt, param_dtype=dt, name="k")(h)
        v = Linear(inner, use_bias=False, dtype=dt, param_dtype=dt, name="v")(h)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5 does not scale q by 1/sqrt(d); fold the bias in as additive logits.
        qf = q.astype(jnp.float32)
        logits = jnp.einsum("bshd,bthd->bhst", qf, k.astype(jnp.float32)) + pos_bias
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", attn, v.astype(jnp.float32)).astype(dt)
        x = x + Linear(cfg.d_model, use_bias=False, dtype=dt, param_dtype=dt, name="o")(
            out.reshape(b, s, inner)
        )
        h = RMSNorm(dtype=dt, name="ln2")(x)
        wi0 = Linear(cfg.d_ff, use_bias=False, dtype=dt, param_dtype=dt, name="wi_0")(h)
        wi1 = Linear(cfg.d_ff, use_bias=False, dtype=dt, param_dtype=dt, name="wi_1")(h)
        h = jax.nn.gelu(wi0, approximate=True) * wi1
        return x + Linear(cfg.d_model, use_bias=False, dtype=dt, param_dtype=dt, name="wo")(h)


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s = input_ids.shape
        emb = self.param(
            "token_embedding", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model),
            jnp.float32,
        )
        x = emb[input_ids].astype(cfg.dtype)

        ctx = jnp.arange(s)[:, None]
        mem = jnp.arange(s)[None, :]
        buckets = _relative_position_bucket(
            mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        if cfg.per_layer_bias:
            pos_bias = None  # each UMT5 layer owns its table
        else:
            # shared relative position bias (layer-0 table)
            rel_table = self.param(
                "relative_attention_bias", nn.initializers.normal(0.4),
                (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32,
            )
            pos_bias = rel_table[buckets].transpose(2, 0, 1)[None]  # [1, H, S, S]

        for i in range(cfg.num_layers):
            x = T5Layer(cfg, name=f"layer_{i}")(x, pos_bias, buckets)
        return RMSNorm(dtype=cfg.dtype, name="final_ln")(x)
