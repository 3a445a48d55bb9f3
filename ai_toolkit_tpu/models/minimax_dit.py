"""MiniMax-H3 diffusion transformer — exact reimplementation.

Parity target: the vendored reference source
``extensions_built_in/diffusion_models/minimax_h3/src/transformer.py``
(MiniMaxH3Transformer: ONE block stack over a packed 1-D sequence
``[text | keyframe-condition video rows | audio rows | target video rows]``
with full self-attention and no per-modality weights — modality behavior
comes from the two input patch projections, the per-row AdaLN
(timestep, modality) table and the two output heads; fused-QKV attention
with per-head RMSNorm and PARTIAL rope (3 axes x 16 freqs -> 48 angles
duplicated to 96 of the 128 head channels, rotate-half convention, shared
checkpoint-resident inv_freq); SwiGLU with fc1 packing [gate | up]; a
2-block token refiner over the projected text; (cos|sin) sinusoidal
timestep embedding of unscaled t in [0, 1] (t = 1 - sigma, t=1 clean);
fp32 islands: patch projections, time embedder, AdaLN projections, final
heads) and ``src/packing.py`` (the packed-layout geometry; reimplemented in
``models/minimax_packing.py``).

The heads predict the data-ward velocity ``clean - noise``; the model
wrapper negates to ai-toolkit's ``noise - clean`` convention
(minimax_h3.py:1009-1030).

TPU-first notes: static shapes; the (timestep, modality) AdaLN table is a
gather over a [M*3, hidden] tensor — M (distinct timesteps per batch) is
static per call-site (the wrapper passes the per-row timesteps and a
precomputed index map instead of torch.unique); blocks run under ``nn.scan``
with remat; fp32 islands are param_dtype=f32 with f32 activations at those
call sites, matching the shipped checkpoint numerics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm

MODALITY_NUM = 3  # 0 = video, 1 = text, 2 = audio; -1 marks padding rows


@dataclass(frozen=True)
class MiniMaxH3Params:
    hidden_size: int = 5376
    num_layers: int = 50
    token_refiner_num_layers: int = 2
    num_attention_heads: int = 56
    attention_head_dim: int = 128  # heads * head_dim = 7168 > hidden_size
    ffn_hidden_size: int = 14336
    latents_dim: int = 24
    audio_latents_dim: int = 32
    patch_size: tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 5120
    timestep_input_dim: int = 256
    time_embed_hidden_size: int = 5376
    time_embed_dim: int = 2688
    rope_inv_freq_len: int = 16
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    qk_norm_eps: float = 1e-5
    final_norm_eps: float = 1e-5
    # pruned checkpoints: timestep MLP replaced by an interpolated lookup
    # table; AdaLN linears gain biases and lose the SiLU
    adaln_t_table_size: int | None = None
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def adaln_apply_silu(self) -> bool:
        return self.adaln_t_table_size is None

    @property
    def adaln_bias(self) -> bool:
        return self.adaln_t_table_size is not None

    @property
    def video_patch_dim(self) -> int:
        pt, ph, pw = self.patch_size
        return self.latents_dim * pt * ph * pw

    @classmethod
    def tiny(cls) -> "MiniMaxH3Params":
        return cls(hidden_size=32, num_layers=2, token_refiner_num_layers=1,
                   num_attention_heads=2, attention_head_dim=24,
                   ffn_hidden_size=64, latents_dim=4, audio_latents_dim=6,
                   text_dim=16, timestep_input_dim=8, time_embed_hidden_size=16,
                   time_embed_dim=12, rope_inv_freq_len=4, remat=False,
                   dtype=jnp.float32)


def minimax_rope_angles(position_ids: jax.Array, inv_freq: jax.Array) -> tuple:
    """position_ids (B, S, 3) float -> (cos, sin) each (B, S, 2*3*len) f32.

    transformer.py MiniMaxH3Rope: per-axis angles pos * inv_freq flattened in
    (t, h, w) order then duplicated [a | a]."""
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, None]
    b, s = freqs.shape[:2]
    freqs = freqs.reshape(b, s, -1)
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_partial_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, S, H, D); cos/sin (B, S, rot): rotate-half the first rot channels."""
    rot = cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    c = cos.astype(x.dtype)[:, :, None]
    s = sin.astype(x.dtype)[:, :, None]
    half = rot // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return jnp.concatenate([x_rot * c + rotated * s, x_pass], axis=-1)


class MiniMaxAttention(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x, rotary=None, mask=None):
        p = self.p
        dt, pdt = p.dtype, p.param_dtype
        nh, hd = p.num_attention_heads, p.attention_head_dim
        inner = nh * hd
        b, s, _ = x.shape
        qkv = Linear(3 * inner, use_bias=False, dtype=dt, param_dtype=pdt,
                     name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        q = RMSNorm(eps=p.qk_norm_eps, dtype=dt, param_dtype=pdt, name="q_norm")(q)
        k = RMSNorm(eps=p.qk_norm_eps, dtype=dt, param_dtype=pdt, name="k_norm")(k)
        if rotary is not None:
            q = _apply_partial_rope(q, *rotary)
            k = _apply_partial_rope(k, *rotary)
        out = dot_product_attention(q, k, v, mask=mask).reshape(b, s, inner)
        return Linear(p.hidden_size, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="out_proj")(out)


class MiniMaxMlp(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x):
        p = self.p
        fused = Linear(2 * p.ffn_hidden_size, use_bias=False, dtype=p.dtype,
                       param_dtype=p.param_dtype, name="fc1")(x)
        gate, up = jnp.split(fused, 2, axis=-1)
        return Linear(p.hidden_size, use_bias=False, dtype=p.dtype,
                      param_dtype=p.param_dtype, name="fc2")(jax.nn.silu(gate) * up)


class MiniMaxAdalnProj(nn.Module):
    """(M, time_embed_dim) f32 -> ``expand`` chunks of (M*modalities, hidden)
    f32; the matmul always runs f32 (transformer.py MiniMaxH3AdalnProj)."""

    p: MiniMaxH3Params
    expand: int
    modalities: int
    use_bias: bool

    @nn.compact
    def __call__(self, temb):
        p = self.p
        if p.adaln_apply_silu:
            temb = jax.nn.silu(temb)
        out = Linear(self.expand * p.hidden_size * self.modalities,
                     use_bias=self.use_bias, dtype=jnp.float32,
                     param_dtype=p.param_dtype, name="linear")(
            temb.astype(jnp.float32))
        out = out.reshape(out.shape[0] * self.modalities,
                          self.expand * p.hidden_size)
        return jnp.split(out, self.expand, axis=-1)


class MiniMaxRefinerBlock(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x, mask=None):
        p = self.p
        h = RMSNorm(eps=p.norm_eps, dtype=p.dtype, param_dtype=p.param_dtype,
                    name="norm1")(x)
        x = x + MiniMaxAttention(p, name="attn")(h, None, mask)
        h = RMSNorm(eps=p.norm_eps, dtype=p.dtype, param_dtype=p.param_dtype,
                    name="norm2")(x)
        return x + MiniMaxMlp(p, name="mlp")(h)


class MiniMaxBlock(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x, temb, adaln_indices, rotary, mask):
        p = self.p
        dt = p.dtype
        mods = MiniMaxAdalnProj(p, expand=6, modalities=MODALITY_NUM,
                                use_bias=p.adaln_bias, name="adaln_proj")(temb)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods

        h = RMSNorm(eps=p.norm_eps, dtype=dt, param_dtype=p.param_dtype,
                    name="norm1")(x)
        h = h * (1.0 + scale_msa[adaln_indices].astype(dt)) \
            + shift_msa[adaln_indices].astype(dt)
        x = x + gate_msa[adaln_indices].astype(dt) * MiniMaxAttention(
            p, name="attn")(h, rotary, mask)

        h = RMSNorm(eps=p.norm_eps, dtype=dt, param_dtype=p.param_dtype,
                    name="norm2")(x)
        h = h * (1.0 + scale_mlp[adaln_indices].astype(dt)) \
            + shift_mlp[adaln_indices].astype(dt)
        return x + gate_mlp[adaln_indices].astype(dt) * MiniMaxMlp(
            p, name="mlp")(h)


class _MiniMaxCarry(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x, temb, adaln_indices, rotary, mask):
        return MiniMaxBlock(self.p, name="block")(
            x, temb, adaln_indices, rotary, mask), None


class MiniMaxH3Transformer(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(
        self,
        hidden_states,          # (B, Nv, video_patch_dim) cond + target video rows
        audio_hidden_states,    # (B, Na, audio_latents_dim)
        encoder_hidden_states,  # (B, L, text_dim)
        unique_t,               # (M,) f32 distinct timesteps, t = 1 - sigma
        t_inverse,              # (B, S) int32 index into unique_t per row
        token_tags,             # (B, S) int32: 0 video, 1 text, 2 audio, -1 pad
        position_ids,           # (B, S, 3) float rotary coords
        video_indices,          # (Nv,) int32 positions in the pack
        audio_indices,          # (Na,) int32
        text_indices,           # (L,) int32
    ):
        p = self.p
        dt, pdt = p.dtype, p.param_dtype
        b, s = token_tags.shape

        inv_freq_init = 1.0 / (p.rope_theta ** (
            np.arange(0, 2 * p.rope_inv_freq_len, 2, dtype=np.float32)
            / (2 * p.rope_inv_freq_len)))
        inv_freq = self.param("rope_inv_freq", lambda rng: jnp.asarray(inv_freq_init),
                              )
        rotary = minimax_rope_angles(position_ids, jax.lax.stop_gradient(inv_freq))

        # fp32 islands: patch projections run f32 on f32 inputs
        video_embeds = Linear(p.hidden_size, dtype=jnp.float32, param_dtype=pdt,
                              name="video_patch_proj")(
            hidden_states.astype(jnp.float32))
        audio_embeds = Linear(p.hidden_size, dtype=jnp.float32, param_dtype=pdt,
                              name="audio_patch_proj")(
            audio_hidden_states.astype(jnp.float32))
        text_embeds = Linear(p.hidden_size, dtype=dt, param_dtype=pdt,
                             name="condition_proj")(
            encoder_hidden_states.astype(dt))

        # timestep embedding (fp32 island)
        if p.adaln_t_table_size is not None:
            table = self.param("adaln_t_table", nn.initializers.zeros_init(),
                               (p.adaln_t_table_size, p.time_embed_dim), jnp.float32)
            pos = jnp.clip(unique_t, 0.0, 1.0) * (p.adaln_t_table_size - 1)
            lo = jnp.floor(pos).astype(jnp.int32)
            hi = jnp.clip(lo + 1, max=p.adaln_t_table_size - 1)
            frac = (pos - lo.astype(jnp.float32))[:, None]
            temb = table[lo] * (1.0 - frac) + table[hi] * frac
        else:
            half = p.timestep_input_dim // 2
            freqs = jnp.exp(-np.log(10_000.0)
                            * jnp.arange(half, dtype=jnp.float32) / half)
            args = unique_t.astype(jnp.float32)[:, None] * freqs[None]
            emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
            emb = Linear(p.time_embed_hidden_size, dtype=jnp.float32,
                         param_dtype=pdt, name="time_proj_in")(emb)
            temb = Linear(p.time_embed_dim, dtype=jnp.float32, param_dtype=pdt,
                          name="time_proj_out")(jax.nn.silu(emb))

        # pad rows never act as keys; as queries they see everything
        is_pad = token_tags < 0
        mask = None
        text_mask = None
        # static decision: masks are cheap, build them whenever pads can exist
        live = ~is_pad
        mask = live[:, None, None, :]
        text_mask = live[:, text_indices][:, None, None, :]

        text_embeds = MiniMaxTokenRefiner(p, name="token_refiner")(
            text_embeds, text_mask)

        x = jnp.zeros((b, s, p.hidden_size), dt)
        x = x.at[:, text_indices].set(text_embeds.astype(dt))
        x = x.at[:, video_indices].set(video_embeds.astype(dt))
        x = x.at[:, audio_indices].set(audio_embeds.astype(dt))

        adaln_indices = t_inverse * MODALITY_NUM + jnp.clip(token_tags, 0, None)

        if p.scan_blocks:
            Carry = (nn.remat(_MiniMaxCarry, prevent_cse=False)
                     if p.remat else _MiniMaxCarry)
            x, _ = nn.scan(
                Carry,
                length=p.num_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(p, name="blocks")(x, temb, adaln_indices, rotary, mask)
        else:
            for i in range(p.num_layers):
                x = MiniMaxBlock(p, name=f"block_{i}")(
                    x, temb, adaln_indices, rotary, mask)

        # final layer: shared shift/scale RMSNorm + two fp32 heads over all rows
        fshift, fscale = MiniMaxAdalnProj(p, expand=2, modalities=1,
                                          use_bias=True, name="final_adaln")(temb)
        h = RMSNorm(eps=p.final_norm_eps, dtype=dt, param_dtype=pdt,
                    name="final_norm")(x)
        h = h * (1.0 + fscale[t_inverse].astype(dt)) + fshift[t_inverse].astype(dt)
        h32 = h.astype(jnp.float32)
        video_all = Linear(p.video_patch_dim, dtype=jnp.float32, param_dtype=pdt,
                           name="video_out")(h32)
        audio_all = Linear(p.audio_latents_dim, dtype=jnp.float32, param_dtype=pdt,
                           name="audio_out")(h32)
        return video_all[:, video_indices], audio_all[:, audio_indices]


class MiniMaxTokenRefiner(nn.Module):
    p: MiniMaxH3Params

    @nn.compact
    def __call__(self, x, mask=None):
        p = self.p
        for i in range(p.token_refiner_num_layers):
            x = MiniMaxRefinerBlock(p, name=f"refiner_{i}")(x, mask)
        return RMSNorm(eps=p.final_norm_eps, dtype=p.dtype,
                       param_dtype=p.param_dtype, name="refiner_norm")(x)


def minimax_lora_targets() -> list[str]:
    return [r"(qkv_proj|out_proj|fc1|fc2)$"]


def minimax_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(qkv_proj|fc1)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(out_proj|fc2)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"adaln_proj/linear/kernel$", ("fsdp", None)),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]
