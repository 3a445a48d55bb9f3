"""CLIP text encoder (covers SD CLIP-L/14 and SDXL OpenCLIP-G/14 configs).

Own Flax implementation (the reference wraps transformers' CLIPTextModel,
``/root/reference/toolkit/stable_diffusion_model.py:492-582``): causal
transformer over BPE tokens, with clip-skip (hidden-state index) and pooled
output (EOS token -> optional text projection) for SDXL/FLUX conditioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import LayerNorm, Linear


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # clip-l: quick_gelu; open-clip-g: gelu
    projection_dim: int | None = None  # set for pooled-projection models (SDXL TE2, flux)
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def clip_l(cls) -> "CLIPTextConfig":
        return cls(projection_dim=768)

    @classmethod
    def open_clip_g(cls) -> "CLIPTextConfig":
        return cls(
            hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
            hidden_act="gelu", projection_dim=1280,
        )

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(
            vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, projection_dim=64, eos_token_id=999, dtype=jnp.float32,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dt = cfg.dtype
        h = LayerNorm(eps=1e-5, dtype=dt, name="ln1")(x)
        b, s, d = h.shape
        nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q = Linear(d, dtype=dt, param_dtype=dt, name="q")(h).reshape(b, s, nh, hd)
        k = Linear(d, dtype=dt, param_dtype=dt, name="k")(h).reshape(b, s, nh, hd)
        v = Linear(d, dtype=dt, param_dtype=dt, name="v")(h).reshape(b, s, nh, hd)
        attn = dot_product_attention(q, k, v, mask=mask, is_causal=mask is None)
        attn = Linear(d, dtype=dt, param_dtype=dt, name="out")(attn.reshape(b, s, d))
        x = x + attn
        h = LayerNorm(eps=1e-5, dtype=dt, name="ln2")(x)
        h = Linear(cfg.intermediate_size, dtype=dt, param_dtype=dt, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = Linear(cfg.hidden_size, dtype=dt, param_dtype=dt, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, S] int32
        clip_skip: int = 0,  # 0 = final LN output; n>0 = n-th-from-last hidden state
    ) -> dict[str, jax.Array]:
        cfg = self.cfg
        dt = cfg.dtype
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size),
            jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        embedded = tok[jnp.clip(input_ids, 0, cfg.vocab_size - 1)]
        if self.has_variable("emb", "bank"):
            # textual inversion: ids >= vocab_size index a trainable token bank
            bank = self.get_variable("emb", "bank")  # [n_vectors, hidden]
            virt = jnp.clip(input_ids - cfg.vocab_size, 0, bank.shape[0] - 1)
            embedded = jnp.where(
                (input_ids >= cfg.vocab_size)[..., None], bank[virt], embedded
            )
        x = (embedded + pos[None, :s]).astype(dt)
        hidden_states = []
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layer_{i}")(x, mask=None)
            hidden_states.append(x)
        final = LayerNorm(eps=1e-5, dtype=dt, name="final_ln")(x)

        # clip_skip semantics: n-th-from-last hidden state, un-normalized
        # (diffusers/SDXL penultimate convention)
        out = final if clip_skip == 0 else hidden_states[-1 - clip_skip]

        # pooled: embedding at the (first) EOS position of the *final* states
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(final, eos_pos[:, None, None], axis=1)[:, 0]
        if cfg.projection_dim:
            pooled = Linear(
                cfg.projection_dim, use_bias=False, dtype=dt, param_dtype=dt,
                name="text_projection",
            )(pooled)
        return {
            "last_hidden_state": out,
            "pooled_output": pooled,
            "penultimate_hidden_state": hidden_states[-2] if cfg.num_layers > 1 else x,
        }
