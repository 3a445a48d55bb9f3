"""LTX-2 joint audio-video DiT (a2v / v2a cross-attention).

Parity target: the reference's LTX-2 transformer joint audio stream
(``/root/reference/extensions_built_in/diffusion_models/ltx2/ltx2.py:945-1079``
training path; block/param structure per the converter key map
``convert_ltx2_to_diffusers.py:22-45``: ``audio_proj_in``,
``audio_time_embed``, per-block ``video_a2v_cross_attn_scale_shift_table`` /
``audio_a2v_cross_attn_scale_shift_table``, global
``av_cross_attn_{video,audio}_scale_shift`` + ``{a2v,v2a}_gate`` adaLN
projections, and an audio head; audio dims from the published configs:
128-ch audio latents, 32 heads x 64 head_dim, cross dim 2048).

TPU-first design: both streams run inside ONE scanned joint block (video
self-attn -> bidirectional AV cross-attn -> text cross-attn -> FFN per
stream), so the whole 48-layer AV stack is a single ``nn.scan`` with stacked
params — LoRA/quant collections get the leading layer axis exactly like the
video-only path. Audio tokens use 1D RoPE over latent time; AV cross-attn
carries no RoPE (different coordinate systems), matching the reference.

Audio front end: the reference-exact mel chain (jit log-mel ->
``models/ltx_audio_vae.LTXAudioVAE`` 2D causal VAE -> 16x8 token packing,
decode via ``models/ltx_vocoder.LTX2Vocoder``) is the DEFAULT whenever a
real checkpoint is in play and is imported from the checkpoint's
``audio_vae/`` + ``vocoder/`` dirs (io/dit_importers.py). The repo's causal
1D waveform VAE (``audio_vae.py``) remains available as
``model_kwargs: {audio_vae: waveform}`` for from-scratch on-device
experiments. Either way the DiT-side contract is identical: a
``[B, T_a, C_a]`` latent token stream, flow-matching target per stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ai_toolkit_tpu.models.wan_dit import WanConfig
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.layers import LayerNorm, Linear, RMSNorm
from ai_toolkit_tpu.ops.rope import apply_rope
from ai_toolkit_tpu.parallel.sharding import PartitionRule


@dataclass(frozen=True)
class LTX2AVConfig:
    video: WanConfig
    audio_in_channels: int = 128
    audio_dim: int = 2048
    audio_ffn_dim: int = 8192
    audio_heads: int = 32  # x64 head_dim = 2048

    @classmethod
    def tiny(cls) -> "LTX2AVConfig":
        return cls(
            video=WanConfig.tiny(), audio_in_channels=4, audio_dim=32,
            audio_ffn_dim=64, audio_heads=2,
        )

    @property
    def audio_head_dim(self) -> int:
        return self.audio_dim // self.audio_heads

    @property
    def av_inner_dim(self) -> int:
        # cross-modality attention width ("audio_cross_attention_dim")
        return min(self.audio_dim, self.video.dim)


def _attn(h_q, h_kv, d_q, d_inner, d_out, nh, name, dt, pdt, pe_q=None, pe_k=None):
    """One attention sub-layer: returns the output projection input→d_out.
    QK RMSNorm is across-heads (ltx/wan `rms_norm_across_heads` semantics)."""
    b, n, _ = h_q.shape
    s = h_kv.shape[1]
    hd = d_inner // nh
    q = RMSNorm(d_inner, dtype=dt, name=f"{name}_q_norm")(
        Linear(d_inner, dtype=dt, param_dtype=pdt, name=f"{name}_q")(h_q)
    ).reshape(b, n, nh, hd)
    k = RMSNorm(d_inner, dtype=dt, name=f"{name}_k_norm")(
        Linear(d_inner, dtype=dt, param_dtype=pdt, name=f"{name}_k")(h_kv)
    ).reshape(b, s, nh, hd)
    v = Linear(d_inner, dtype=dt, param_dtype=pdt, name=f"{name}_v")(h_kv).reshape(b, s, nh, hd)
    if pe_q is not None:
        q = apply_rope(q, pe_q)
    if pe_k is not None:
        k = apply_rope(k, pe_k)
    attn = dot_product_attention(q, k, v)
    return Linear(d_out, dtype=dt, param_dtype=pdt, name=f"{name}_o")(attn.reshape(b, n, d_inner))


class AVBlock(nn.Module):
    cfg: LTX2AVConfig

    @nn.compact
    def __call__(self, xv, xa, ctx_v, ctx_a, ev, ea, av_v, av_a, pe_v, pe_a):
        """xv: [B,Nv,Dv] video tokens; xa: [B,Na,Da] audio tokens;
        ev/ea: [B,6,D*] adaLN mods per stream; av_v/av_a: [B,3,D*]
        (shift, scale, gate) for the AV cross-attn stage."""
        cfg = self.cfg
        v = cfg.video
        dt, pdt = v.dtype, v.param_dtype
        dv, da = v.dim, cfg.audio_dim
        inner = cfg.av_inner_dim

        def mods(e, table_name, d, n_mod):
            table = self.param(table_name, nn.initializers.normal(0.02), (n_mod, d), jnp.float32)
            e = (e + table[None]).astype(jnp.float32)
            return [e[:, i][:, None, :].astype(dt) for i in range(n_mod)]

        sh_v, sc_v, g_v, shf_v, scf_v, gf_v = mods(ev, "modulation", dv, 6)
        sh_a, sc_a, g_a, shf_a, scf_a, gf_a = mods(ea, "audio_modulation", da, 6)
        # per-block AV tables (reference *_a2v_cross_attn_scale_shift_table)
        avs_v, avc_v, avg_v = mods(av_v, "av_video_table", dv, 3)
        avs_a, avc_a, avg_a = mods(av_a, "av_audio_table", da, 3)

        # 1. self attention per stream (RoPE within each stream's coords)
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm1")(xv)
        h = h * (1 + sc_v) + sh_v
        xv = xv + g_v * _attn(h, h, dv, dv, dv, v.num_heads, "self", dt, pdt, pe_v, pe_v)
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="audio_norm1")(xa)
        h = h * (1 + sc_a) + sh_a
        xa = xa + g_a * _attn(
            h, h, da, da, da, cfg.audio_heads, "audio_self", dt, pdt, pe_a, pe_a
        )

        # 2. bidirectional AV cross attention (no rope across modalities)
        hv = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="av_norm_v")(xv)
        hv = hv * (1 + avc_v) + avs_v
        ha = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="av_norm_a")(xa)
        ha = ha * (1 + avc_a) + avs_a
        xv = xv + avg_v * _attn(hv, ha, dv, inner, dv, cfg.audio_heads, "a2v", dt, pdt)
        xa = xa + avg_a * _attn(ha, hv, da, inner, da, cfg.audio_heads, "v2a", dt, pdt)

        # 3. text cross attention per stream (unmodulated, wan/ltx convention)
        h = LayerNorm(dtype=dt, name="norm2")(xv)
        xv = xv + _attn(h, ctx_v, dv, dv, dv, v.num_heads, "cross", dt, pdt)
        h = LayerNorm(dtype=dt, name="audio_norm2")(xa)
        xa = xa + _attn(h, ctx_a, da, da, da, cfg.audio_heads, "audio_cross", dt, pdt)

        # 4. FFN per stream
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm3")(xv)
        h = h * (1 + scf_v) + shf_v
        h = Linear(v.ffn_dim, dtype=dt, param_dtype=pdt, name="ffn_in")(h)
        xv = xv + gf_v * Linear(dv, dtype=dt, param_dtype=pdt, name="ffn_out")(
            jax.nn.gelu(h, approximate=True)
        )
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="audio_norm3")(xa)
        h = h * (1 + scf_a) + shf_a
        h = Linear(cfg.audio_ffn_dim, dtype=dt, param_dtype=pdt, name="audio_ffn_in")(h)
        xa = xa + gf_a * Linear(da, dtype=dt, param_dtype=pdt, name="audio_ffn_out")(
            jax.nn.gelu(h, approximate=True)
        )
        return xv, xa


class _AVCarry(nn.Module):
    cfg: LTX2AVConfig

    @nn.compact
    def __call__(self, carry, ctx_v, ctx_a, ev, ea, av_v, av_a, pe_v, pe_a):
        xv, xa = carry
        xv, xa = AVBlock(self.cfg, name="block")(
            xv, xa, ctx_v, ctx_a, ev, ea, av_v, av_a, pe_v, pe_a
        )
        return (xv, xa), None


class LTX2AVDiT(nn.Module):
    """Joint AV transformer. Returns (video_pred_tokens, audio_pred_tokens)."""

    cfg: LTX2AVConfig

    @nn.compact
    def __call__(
        self,
        xv: jax.Array,  # [B, Nv, video_patch_dim]
        xa: jax.Array,  # [B, Na, audio_in_channels]
        context: jax.Array,  # [B, S, text_dim]
        t: jax.Array,  # [B] in [0,1] (shared sigma across streams)
        pe_v: jax.Array,
        pe_a: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        v = cfg.video
        dt, pdt = v.dtype, v.param_dtype
        dv, da = v.dim, cfg.audio_dim
        pt, ph, pw = v.patch_size
        video_patch_dim = v.in_channels * pt * ph * pw

        xv = Linear(dv, dtype=dt, param_dtype=pdt, name="patch_embedding")(xv)
        xa = Linear(da, dtype=dt, param_dtype=pdt, name="audio_proj_in")(xa)

        ctx_v = Linear(dv, dtype=dt, param_dtype=pdt, name="text_embedding_in")(context.astype(dt))
        ctx_v = Linear(dv, dtype=dt, param_dtype=pdt, name="text_embedding_out")(nn.gelu(ctx_v))
        # audio text connector (reference audio_connector / audio_text_proj_in)
        ctx_a = Linear(da, dtype=dt, param_dtype=pdt, name="audio_text_in")(context.astype(dt))
        ctx_a = Linear(da, dtype=dt, param_dtype=pdt, name="audio_text_out")(nn.gelu(ctx_a))

        def time_branch(name, d, n_mod):
            temb = timestep_embedding(t, v.freq_dim).astype(dt)
            temb = Linear(d, dtype=dt, param_dtype=pdt, name=f"{name}_fc1")(temb)
            temb = Linear(d, dtype=dt, param_dtype=pdt, name=f"{name}_fc2")(nn.silu(temb))
            e = Linear(d * n_mod, dtype=dt, param_dtype=pdt, name=f"{name}_proj")(nn.silu(temb))
            return temb, e.reshape(e.shape[0], n_mod, d)

        temb_v, ev = time_branch("time", dv, 6)
        temb_a, ea = time_branch("audio_time", da, 6)
        # global AV cross-attn adaLN (reference av_cross_attn_*_scale_shift/gate)
        av_v = Linear(dv * 3, dtype=dt, param_dtype=pdt, name="av_mod_video")(
            nn.silu(temb_v)
        ).reshape(-1, 3, dv)
        av_a = Linear(da * 3, dtype=dt, param_dtype=pdt, name="av_mod_audio")(
            nn.silu(temb_a)
        ).reshape(-1, 3, da)

        if v.scan_blocks:
            Carry = nn.remat(_AVCarry, prevent_cse=False) if v.remat else _AVCarry
            (xv, xa), _ = nn.scan(
                Carry,
                length=v.num_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0, "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 8,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")((xv, xa), ctx_v, ctx_a, ev, ea, av_v, av_a, pe_v, pe_a)
        else:
            Block = nn.remat(AVBlock) if v.remat else AVBlock
            for i in range(v.num_layers):
                xv, xa = Block(cfg, name=f"block_{i}")(
                    xv, xa, ctx_v, ctx_a, ev, ea, av_v, av_a, pe_v, pe_a
                )

        def head(x, temb, d, out_dim, name):
            table = self.param(
                f"{name}_modulation", nn.initializers.normal(0.02), (2, d), jnp.float32
            )
            he = (
                Linear(d * 2, dtype=dt, param_dtype=pdt, name=f"{name}_time")(
                    nn.silu(temb)
                ).reshape(-1, 2, d)
                + table[None]
            ).astype(dt)
            h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name=f"{name}_norm")(x)
            h = h * (1 + he[:, 1][:, None]) + he[:, 0][:, None]
            return Linear(out_dim, dtype=dt, param_dtype=pdt, name=f"{name}_out")(h)

        return (
            head(xv, temb_v, dv, video_patch_dim, "head"),
            head(xa, temb_a, da, cfg.audio_in_channels, "audio_head"),
        )


def av_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    pre = r"blocks/block/" if scan_blocks else r""
    lead = (None,) if scan_blocks else ()
    return [
        PartitionRule(pre + r"(audio_)?(self|cross|a2v|v2a)_(q|k|v)/kernel", P(*lead, "fsdp", "tp")),
        PartitionRule(pre + r"(audio_)?(self|cross|a2v|v2a)_o/kernel", P(*lead, "tp", "fsdp")),
        PartitionRule(pre + r"(audio_)?ffn_in/kernel", P(*lead, "fsdp", "tp")),
        PartitionRule(pre + r"(audio_)?ffn_out/kernel", P(*lead, "tp", "fsdp")),
    ]
