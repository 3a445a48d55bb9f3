"""Boogu-Image DiT (exact layout) + model wrapper.

Parity target: the reference's vendored Boogu sources —
``extensions_built_in/diffusion_models/boogu_image/src/transformer.py``
(mixed double-stream -> single-stream topology, GQA attention, lumina2-style
modulation), ``src/block_lumina2.py`` (LuminaRMSNormZero / LuminaFeedForward /
Lumina2CombinedTimestepCaptionEmbedding / LuminaLayerNormContinuous),
``src/attention_processor.py`` (joint double-stream processor with per-stream
q/k/v + shared out), ``src/rope.py`` (3-axis complex rope with per-sample
caption-length position shifts), and ``boogu_image.py`` (Qwen-VL instruction
features, velocity sign/timestep conventions, flux VAE).

TPU-first restructuring (numerics preserved):
- The reference packs each sample's [caption_eff | ref | image] tokens
  end-to-end with python loops over per-sample lengths. Here sequences stay
  padded ([caption_padded | image]) with a key-padding mask — attention is
  permutation/padding invariant, and every non-attention op is per-token, so
  valid tokens see identical values while shapes stay static for XLA.
- Per-sample caption lengths only enter through rope position ids (the image
  axis-0 id is the *effective* caption length); those are computed in-graph
  from the mask instead of host loops.
- Block stacks run under ``nn.scan`` (+remat) like every production DiT here.

Checkpoint layout: diffusers-root keys of ``BooguImageTransformer2DModel``
(x_embedder, time_caption_embed.*, {noise,ref_image,context}_refiner.N.*,
double_stream_layers.N.* (incl. img_instruct_attn.processor.*),
single_stream_layers.N.*, norm_out.*, image_index_embedding) — see
``io/dit_importers.boogu_dit_rules``.
"""

from __future__ import annotations

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
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

Dtype = jnp.dtype


@dataclass(frozen=True)
class BooguConfig:
    patch_size: int = 2
    in_channels: int = 16
    hidden_size: int = 3360
    num_layers: int = 40
    num_double_stream_layers: int = 8
    num_refiner_layers: int = 2
    num_heads: int = 28
    num_kv_heads: int = 7
    multiple_of: int = 256
    norm_eps: float = 1e-5
    axes_dim: tuple[int, int, int] = (40, 40, 40)
    theta: float = 10000.0
    instruction_feat_dim: int = 4096
    timestep_scale: float = 1000.0
    scan_blocks: bool = True
    remat: bool = True
    remat_policy: str = "dots_flash"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def time_dim(self) -> int:
        return min(self.hidden_size, 1024)

    @property
    def ffn_dim(self) -> int:
        inner = 4 * self.hidden_size
        m = self.multiple_of
        return m * ((inner + m - 1) // m)

    @property
    def num_single_stream_layers(self) -> int:
        return self.num_layers - self.num_double_stream_layers

    @classmethod
    def tiny(cls) -> "BooguConfig":
        return cls(
            in_channels=4, hidden_size=32, num_layers=3,
            num_double_stream_layers=1, num_refiner_layers=1, num_heads=4,
            num_kv_heads=2, multiple_of=8, axes_dim=(4, 2, 2),
            instruction_feat_dim=16, scan_blocks=False, remat=False,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )


def _rms(x, weight, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


class TRMSNorm(nn.Module):
    """torch.nn.RMSNorm with learned scale."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones_init(), (self.dim,), jnp.float32)
        return _rms(x, w, self.eps)


def boogu_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Lumina-style complex rope on interleaved pairs.

    x [B,S,H,D]; cos/sin [B,S,1,D/2] — pair (x[2i], x[2i+1]) is one complex
    number multiplied by cis(angle_i) (reference embeddings.apply_rotary_emb
    with use_real=False)."""
    shape = x.shape
    xr = x.astype(jnp.float32).reshape(shape[:-1] + (shape[-1] // 2, 2))
    a, b = xr[..., 0], xr[..., 1]
    o0 = a * cos - b * sin
    o1 = a * sin + b * cos
    return jnp.stack([o0, o1], axis=-1).reshape(shape).astype(x.dtype)


def rope_cos_sin(pos_ids: jax.Array, axes_dim, theta: float):
    """pos_ids [B, S, n_axes] -> (cos, sin) [B, S, 1, head_dim/2]."""
    cs, sn = [], []
    for i, d in enumerate(axes_dim):
        f = jnp.asarray(1.0 / theta ** (np.arange(0, d, 2) / d), jnp.float32)
        ang = pos_ids[..., i].astype(jnp.float32)[..., None] * f  # [B,S,d/2]
        cs.append(jnp.cos(ang))
        sn.append(jnp.sin(ang))
    return (jnp.concatenate(cs, -1)[:, :, None, :],
            jnp.concatenate(sn, -1)[:, :, None, :])


class LuminaFeedForward(nn.Module):
    """SwiGLU: linear_2(silu_f32(linear_1 x) * linear_3 x), no biases."""

    cfg: BooguConfig

    @nn.compact
    def __call__(self, x):
        cfg, dt, pdt = self.cfg, self.cfg.dtype, self.cfg.param_dtype
        h1 = Linear(cfg.ffn_dim, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="linear_1")(x)
        h2 = Linear(cfg.ffn_dim, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="linear_3")(x)
        g = jax.nn.silu(h1.astype(jnp.float32)).astype(h1.dtype) * h2
        return Linear(cfg.hidden_size, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="linear_2")(g)


class LuminaRMSNormZero(nn.Module):
    """temb -> (scale_msa, gate_msa, scale_mlp, gate_mlp); x normed*(1+scale)."""

    cfg: BooguConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        emb = Linear(4 * cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="linear")(nn.silu(temb.astype(cfg.dtype)))
        s_msa, g_msa, s_mlp, g_mlp = jnp.split(emb, 4, axis=-1)
        normed = TRMSNorm(cfg.hidden_size, cfg.norm_eps, name="norm")(x)
        return normed * (1.0 + s_msa[:, None]), g_msa, s_mlp, g_mlp


def _gqa_attention(q, k, v, cfg: BooguConfig, mask, cos, sin, qn, kn):
    """Shared GQA core: reshape heads, qk-norm, rope, repeat kv, attend.

    q [B,S,Hq*D]; k/v [B,S,Hkv*D]; qn/kn are TRMSNorm modules over head_dim.
    mask: key-padding [B, T] bool or None.
    """
    b, s = q.shape[0], q.shape[1]
    hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    q = qn(q.reshape(b, s, nh, hd))
    k = kn(k.reshape(b, -1, nkv, hd))
    v = v.reshape(b, -1, nkv, hd)
    q = boogu_rope(q, cos, sin)
    k = boogu_rope(k, cos, sin)
    if nkv < nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    m4 = None
    if mask is not None:
        m4 = jnp.broadcast_to(mask[:, None, None, :].astype(bool),
                              (b, 1, s, mask.shape[-1]))
    out = dot_product_attention(q, k.astype(q.dtype), v.astype(q.dtype), mask=m4,
                                scale=hd ** -0.5)
    return out.reshape(b, s, nh * hd)


class BooguBlock(nn.Module):
    """Basic block (refiners + single-stream): GQA attn + SwiGLU with
    post-sub-layer RMSNorms and tanh-gated modulation."""

    cfg: BooguConfig
    modulation: bool = True

    @nn.compact
    def __call__(self, x, mask, cos, sin, temb=None):
        cfg, dt, pdt = self.cfg, self.cfg.dtype, self.cfg.param_dtype
        h = cfg.hidden_size

        def attn(xn):
            q = Linear(h, use_bias=False, dtype=dt, param_dtype=pdt, name="attn_q")(xn)
            k = Linear(cfg.num_kv_heads * cfg.head_dim, use_bias=False, dtype=dt,
                       param_dtype=pdt, name="attn_k")(xn)
            v = Linear(cfg.num_kv_heads * cfg.head_dim, use_bias=False, dtype=dt,
                       param_dtype=pdt, name="attn_v")(xn)
            o = _gqa_attention(
                q, k, v, cfg, mask, cos, sin,
                TRMSNorm(cfg.head_dim, 1e-5, name="attn_q_norm"),
                TRMSNorm(cfg.head_dim, 1e-5, name="attn_k_norm"),
            )
            return Linear(h, use_bias=False, dtype=dt, param_dtype=pdt,
                          name="attn_out")(o)

        ff = LuminaFeedForward(cfg, name="feed_forward")
        norm2 = TRMSNorm(h, cfg.norm_eps, name="norm2")
        ffn_norm1 = TRMSNorm(h, cfg.norm_eps, name="ffn_norm1")
        ffn_norm2 = TRMSNorm(h, cfg.norm_eps, name="ffn_norm2")
        if self.modulation:
            xn, g_msa, s_mlp, g_mlp = LuminaRMSNormZero(cfg, name="norm1")(x, temb)
            x = x + jnp.tanh(g_msa)[:, None].astype(x.dtype) * norm2(attn(xn))
            mlp = ff(ffn_norm1(x) * (1.0 + s_mlp[:, None].astype(x.dtype)))
            return x + jnp.tanh(g_mlp)[:, None].astype(x.dtype) * ffn_norm2(mlp)
        xn = TRMSNorm(h, cfg.norm_eps, name="norm1")(x)
        x = x + norm2(attn(xn))
        return x + ffn_norm2(ff(ffn_norm1(x)))


class BooguDoubleBlock(nn.Module):
    """Double-stream block: joint [instruct|img] attention (per-stream q/k/v +
    per-stream out + shared out), image self-attention, per-stream SwiGLU."""

    cfg: BooguConfig

    @nn.compact
    def __call__(self, img, instr, img_mask, instr_mask, img_cos, img_sin,
                 joint_cos, joint_sin, temb):
        cfg, dt, pdt = self.cfg, self.cfg.dtype, self.cfg.param_dtype
        h = cfg.hidden_size
        kvd = cfg.num_kv_heads * cfg.head_dim
        b, li = instr.shape[0], instr.shape[1]

        # modulations (reference: norm1 drives attn scale/gates, norm2 the mlp
        # pre-norm + shift, norm3 the self-attn scale/gate)
        i_n1, i_gmsa, i_smlp, i_gmlp = LuminaRMSNormZero(cfg, name="img_norm1")(img, temb)
        i_n2, i_shift, _, _ = LuminaRMSNormZero(cfg, name="img_norm2")(img, temb)
        i_n3, i_gself, _, _ = LuminaRMSNormZero(cfg, name="img_norm3")(img, temb)
        t_n1, t_gmsa, t_smlp, t_gmlp = LuminaRMSNormZero(cfg, name="instruct_norm1")(instr, temb)
        t_n2, t_shift, _, _ = LuminaRMSNormZero(cfg, name="instruct_norm2")(instr, temb)

        # joint attention: separate q/k/v per stream, concat [instruct | img]
        def proj(n, f, x_):
            return Linear(f, use_bias=False, dtype=dt, param_dtype=pdt, name=n)(x_)

        q = jnp.concatenate([proj("instruct_to_q", h, t_n1), proj("img_to_q", h, i_n1)], 1)
        k = jnp.concatenate([proj("instruct_to_k", kvd, t_n1), proj("img_to_k", kvd, i_n1)], 1)
        v = jnp.concatenate([proj("instruct_to_v", kvd, t_n1), proj("img_to_v", kvd, i_n1)], 1)
        joint_mask = jnp.concatenate(
            [instr_mask.astype(bool), jnp.ones((b, img.shape[1]), bool)], axis=1
        )
        jo = _gqa_attention(
            q, k, v, cfg, joint_mask, joint_cos, joint_sin,
            TRMSNorm(cfg.head_dim, 1e-5, name="joint_q_norm"),
            TRMSNorm(cfg.head_dim, 1e-5, name="joint_k_norm"),
        )
        t_att = proj("instruct_out", h, jo[:, :li])
        i_att = proj("img_out", h, jo[:, li:])
        shared = Linear(h, use_bias=False, dtype=dt, param_dtype=pdt, name="joint_to_out")
        t_att, i_att = shared(t_att), shared(i_att)

        # image self-attention
        sq = proj("self_to_q", h, i_n3)
        sk = proj("self_to_k", kvd, i_n3)
        sv = proj("self_to_v", kvd, i_n3)
        so = _gqa_attention(
            sq, sk, sv, cfg, img_mask, img_cos, img_sin,
            TRMSNorm(cfg.head_dim, 1e-5, name="self_q_norm"),
            TRMSNorm(cfg.head_dim, 1e-5, name="self_k_norm"),
        )
        so = Linear(h, use_bias=False, dtype=dt, param_dtype=pdt, name="self_to_out")(so)

        eps = cfg.norm_eps
        img = img + jnp.tanh(i_gmsa)[:, None].astype(img.dtype) * TRMSNorm(
            h, eps, name="img_attn_norm")(i_att)
        img = img + jnp.tanh(i_gself)[:, None].astype(img.dtype) * TRMSNorm(
            h, eps, name="img_self_attn_norm")(so)
        i_mlp_in = (1.0 + i_smlp[:, None].astype(img.dtype)) * i_n2 + i_shift[:, None].astype(img.dtype)
        i_mlp = LuminaFeedForward(cfg, name="img_feed_forward")(
            TRMSNorm(h, eps, name="img_ffn_norm1")(i_mlp_in)
        )
        img = img + jnp.tanh(i_gmlp)[:, None].astype(img.dtype) * TRMSNorm(
            h, eps, name="img_ffn_norm2")(i_mlp)

        instr = instr + jnp.tanh(t_gmsa)[:, None].astype(instr.dtype) * TRMSNorm(
            h, eps, name="instruct_attn_norm")(t_att)
        t_mlp_in = (1.0 + t_smlp[:, None].astype(instr.dtype)) * t_n2 + t_shift[:, None].astype(instr.dtype)
        t_mlp = LuminaFeedForward(cfg, name="instruct_feed_forward")(
            TRMSNorm(h, eps, name="instruct_ffn_norm1")(t_mlp_in)
        )
        instr = instr + jnp.tanh(t_gmlp)[:, None].astype(instr.dtype) * TRMSNorm(
            h, eps, name="instruct_ffn_norm2")(t_mlp)
        return img, instr


class _SingleCarry(nn.Module):
    cfg: BooguConfig

    @nn.compact
    def __call__(self, x, mask, cos, sin, temb):
        return BooguBlock(self.cfg, name="block")(x, mask, cos, sin, temb), None


class _DoubleCarry(nn.Module):
    cfg: BooguConfig

    @nn.compact
    def __call__(self, carry, img_mask, instr_mask, img_cos, img_sin,
                 joint_cos, joint_sin, temb):
        img, instr = carry
        img, instr = BooguDoubleBlock(self.cfg, name="block")(
            img, instr, img_mask, instr_mask, img_cos, img_sin,
            joint_cos, joint_sin, temb)
        return (img, instr), None


class BooguDiT(nn.Module):
    """Full transformer. Token streams stay padded; see module docstring."""

    cfg: BooguConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, L_img, p*p*C] patchified noisy latents
        instr: jax.Array,  # [B, L_i, feat_dim] instruction (LLM) states
        t: jax.Array,  # [B] boogu-native time (1 = clean, 0 = noise)
        instr_mask: jax.Array,  # [B, L_i] bool/int
        hw: tuple[int, int],  # (h_tokens, w_tokens) static
        ref: jax.Array | None = None,  # [B, L_ref, p*p*C] optional ref image
        ref_hw: tuple[int, int] | None = None,
    ) -> jax.Array:
        cfg, dt, pdt = self.cfg, self.cfg.dtype, self.cfg.param_dtype
        h = cfg.hidden_size
        b, li = instr.shape[0], instr.shape[1]
        h_tok, w_tok = hw

        # --- time + caption embeds (Lumina2CombinedTimestepCaptionEmbedding)
        half = 128
        freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None] * cfg.timestep_scale
        tproj = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # flip_sin_to_cos
        temb = Linear(cfg.time_dim, dtype=dt, param_dtype=pdt, name="t_embed_1")(
            tproj.astype(dt))
        temb = Linear(cfg.time_dim, dtype=dt, param_dtype=pdt, name="t_embed_2")(
            nn.silu(temb))
        cap = TRMSNorm(cfg.instruction_feat_dim, cfg.norm_eps, name="cap_norm")(
            instr.astype(dt))
        instr_h = Linear(h, dtype=dt, param_dtype=pdt, name="cap_embed")(cap)

        # --- rope position ids (in-graph; cap_len is per-sample effective)
        cap_len = instr_mask.astype(jnp.int32).sum(axis=1)  # [B]
        txt_ids = jnp.broadcast_to(
            jnp.arange(li, dtype=jnp.int32)[None, :, None], (b, li, 3))
        t_cos, t_sin = rope_cos_sin(txt_ids, cfg.axes_dim, cfg.theta)

        rows = jnp.repeat(jnp.arange(h_tok, dtype=jnp.int32), w_tok)
        cols = jnp.tile(jnp.arange(w_tok, dtype=jnp.int32), h_tok)
        pe_shift = cap_len  # [B]
        ref_cos = ref_sin = None
        if ref is not None:
            rh, rw = ref_hw
            r_rows = jnp.repeat(jnp.arange(rh, dtype=jnp.int32), rw)
            r_cols = jnp.tile(jnp.arange(rw, dtype=jnp.int32), rh)
            lr = rh * rw
            r_ids = jnp.stack([
                jnp.broadcast_to(pe_shift[:, None], (b, lr)),
                jnp.broadcast_to(r_rows[None], (b, lr)),
                jnp.broadcast_to(r_cols[None], (b, lr)),
            ], axis=-1)
            ref_cos, ref_sin = rope_cos_sin(r_ids, cfg.axes_dim, cfg.theta)
            pe_shift = pe_shift + max(rh, rw)
        limg = h_tok * w_tok
        img_ids = jnp.stack([
            jnp.broadcast_to(pe_shift[:, None], (b, limg)),
            jnp.broadcast_to(rows[None], (b, limg)),
            jnp.broadcast_to(cols[None], (b, limg)),
        ], axis=-1)
        i_cos, i_sin = rope_cos_sin(img_ids, cfg.axes_dim, cfg.theta)

        # --- context refiner (non-modulated)
        for n in range(cfg.num_refiner_layers):
            instr_h = BooguBlock(cfg, modulation=False, name=f"context_refiner_{n}")(
                instr_h, instr_mask, t_cos, t_sin)

        # --- noise refiner on image tokens (modulated)
        x = Linear(h, dtype=dt, param_dtype=pdt, name="x_embedder")(img.astype(dt))
        for n in range(cfg.num_refiner_layers):
            x = BooguBlock(cfg, name=f"noise_refiner_{n}")(x, None, i_cos, i_sin, temb)

        # --- reference-image stream (edit model). Params must exist for
        # checkpoint import even on the t2i path, so with no ref input the
        # branch runs on one dummy token and the result is discarded (XLA
        # dead-code-eliminates it; 2 refiner blocks x 1 token is nothing).
        idx_emb = self.param("image_index_embedding",
                             nn.initializers.normal(0.02), (5, h), pdt)
        if ref is None:
            dummy_hw = (1, 1)
            r_in = jnp.zeros((b, 1, img.shape[-1]), img.dtype)
            rc, rs = rope_cos_sin(jnp.zeros((b, 1, 3), jnp.int32), cfg.axes_dim,
                                  cfg.theta)
        else:
            dummy_hw = ref_hw
            r_in, rc, rs = ref, ref_cos, ref_sin
        del dummy_hw
        r = Linear(h, dtype=dt, param_dtype=pdt, name="ref_image_patch_embedder")(
            r_in.astype(dt)) + idx_emb[0].astype(dt)
        for n in range(cfg.num_refiner_layers):
            r = BooguBlock(cfg, name=f"ref_image_refiner_{n}")(r, None, rc, rs, temb)
        if ref is not None:
            x = jnp.concatenate([r, x], axis=1)
            i_cos = jnp.concatenate([ref_cos, i_cos], axis=1)
            i_sin = jnp.concatenate([ref_sin, i_sin], axis=1)

        j_cos = jnp.concatenate([jnp.broadcast_to(t_cos, (b,) + t_cos.shape[1:]), i_cos], 1)
        j_sin = jnp.concatenate([jnp.broadcast_to(t_sin, (b,) + t_sin.shape[1:]), i_sin], 1)

        # --- double-stream stage
        dmask = instr_mask
        if cfg.scan_blocks and cfg.num_double_stream_layers > 0:
            scan_kwargs = dict(
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 7,
                metadata_params={nn.PARTITION_NAME: None},
            )
            remat_kwargs = {"prevent_cse": False}
            if cfg.remat_policy == "dots_flash":
                remat_kwargs["policy"] = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse"),
                )
            DC = nn.remat(_DoubleCarry, **remat_kwargs) if cfg.remat else _DoubleCarry
            (x, instr_h), _ = nn.scan(
                DC, length=cfg.num_double_stream_layers, **scan_kwargs
            )(cfg, name="double_blocks")((x, instr_h), None, dmask, i_cos, i_sin,
                                         j_cos, j_sin, temb)
        else:
            for n in range(cfg.num_double_stream_layers):
                x, instr_h = BooguDoubleBlock(cfg, name=f"double_{n}")(
                    x, instr_h, None, dmask, i_cos, i_sin, j_cos, j_sin, temb)

        # --- fuse streams -> single-stream stage
        joint = jnp.concatenate([instr_h, x], axis=1)
        joint_mask = jnp.concatenate(
            [instr_mask.astype(bool), jnp.ones((b, x.shape[1]), bool)], axis=1)
        if cfg.scan_blocks and cfg.num_single_stream_layers > 0:
            scan_kwargs = dict(
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )
            remat_kwargs = {"prevent_cse": False}
            if cfg.remat_policy == "dots_flash":
                remat_kwargs["policy"] = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse"),
                )
            SC = nn.remat(_SingleCarry, **remat_kwargs) if cfg.remat else _SingleCarry
            joint, _ = nn.scan(
                SC, length=cfg.num_single_stream_layers, **scan_kwargs
            )(cfg, name="single_blocks")(joint, joint_mask, j_cos, j_sin, temb)
        else:
            for n in range(cfg.num_single_stream_layers):
                joint = BooguBlock(cfg, name=f"single_{n}")(
                    joint, joint_mask, j_cos, j_sin, temb)

        # --- output projection (LuminaLayerNormContinuous, eps 1e-6 no affine)
        scale = Linear(h, dtype=dt, param_dtype=pdt, name="norm_out_linear_1")(
            nn.silu(temb.astype(jnp.float32)).astype(dt))
        xo = joint[:, li:][:, -limg:]  # image tokens (drop instr + ref)
        xf = xo.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(xo.dtype)
        xn = xn * (1.0 + scale)[:, None]
        return Linear(cfg.patch_size ** 2 * cfg.in_channels, dtype=dt,
                      param_dtype=pdt, name="norm_out_linear_2")(xn)


def boogu_patchify(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)(W/p), p*p*C] in the reference's
    'c (h p1) (w p2) -> (h w) (p1 p2 c)' feature order."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // p, p, ww // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hh // p) * (ww // p), p * p * c)


def boogu_unpatchify(x: jax.Array, h_tok: int, w_tok: int, p: int, c: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h_tok, w_tok, p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h_tok * p, w_tok * p, c)


def boogu_lora_targets() -> list[str]:
    return [
        r"(attn|joint|self|img|instruct)_(to_)?(q|k|v|out|to_out)(/|$)",
        r"feed_forward/linear_[123]",
    ]


def boogu_partition_rules(scan_blocks: bool = True):
    from ai_toolkit_tpu.models.flux_dit import flux_partition_rules

    return flux_partition_rules(scan_blocks)


@register_model
class BooguModel(BaseTpuModel):
    """Wrapper: flux VAE, Qwen-VL-style instruction LLM (text tower), exact
    BooguDiT. Velocity convention per the reference wrapper
    (boogu_image.py get_noise_prediction): model native t = 1 - sigma and
    predicts clean - noise -> negate to the toolkit velocity."""

    arch = "boogu_image"
    archs = ["boogu_image", "boogu_image_edit", "boogu"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        self.is_edit = "edit" in (config.arch or "")
        if size == "tiny":
            self.dit_config = BooguConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.llm_config = LLMConfig.tiny(d_model=16)
            self.max_txt_len = 16
        else:
            self.dit_config = BooguConfig(
                scan_blocks=bool(config.model_kwargs.get("scan_blocks", True))
            )
            self.vae_config = VAEConfig.flux()
            # Qwen3-VL text tower (mllm/): hidden 4096; random-init offline
            self.llm_config = LLMConfig.qwen25_7b()
        self.dit = BooguDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        p = cfg.patch_size
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, p * p * cfg.in_channels)),
            jnp.zeros((1, 8, cfg.instruction_feat_dim)), jnp.zeros((1,)),
            jnp.ones((1, 8), jnp.int32), (2, 2),
        )
        d = self.vae_config.downscale
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, 2 * d, 2 * d, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"],
                "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_boogu_checkpoint

            return load_boogu_checkpoint(path, self)
        if path:
            # loud failure beats silently training against random weights
            raise FileNotFoundError(
                f"arch '{self.config.arch}': no transformer/ checkpoint found "
                f"under '{path}' — refusing to random-init a named model. Use "
                f'name_or_path: "" for architecture experiments from scratch.'
            )
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        mask[:, 0] = 1
        txt = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask))
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0):
        # rope is computed inside the DiT (depends on per-sample caption
        # lengths); nothing to precompute
        return jnp.zeros((0,))

    def predict(self, variables, noisy_latents, t, cond):
        b, hh, ww, c = noisy_latents.shape
        cfg = self.dit_config
        p = cfg.patch_size
        img = boogu_patchify(noisy_latents, p)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        ref = None
        ref_hw = None
        if self.is_edit and cond.get("control_latents") is not None:
            ctrl = cond["control_latents"]
            ref = boogu_patchify(ctrl, p)
            ref_hw = (ctrl.shape[1] // p, ctrl.shape[2] // p)
        out = self.dit.apply(
            colls, img, cond["txt"], 1.0 - t, cond["txt_mask"],
            (hh // p, ww // p), ref, ref_hw,
        )
        return -boogu_unpatchify(out, hh // p, ww // p, p, c)

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
        p = self.dit_config.patch_size
        return (h // p) * (w // p)

    def lora_targets(self):
        return boogu_lora_targets()

    def partition_rules(self):
        return boogu_partition_rules(self.dit_config.scan_blocks)
