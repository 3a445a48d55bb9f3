"""Lumina-Image-2.0 transformer — exact diffusers Lumina2Transformer2DModel.

The block/module internals are pinned by the reference's vendored copies of
the diffusers Lumina2 modules (omnigen2 and boogu both vendor them:
``extensions_built_in/diffusion_models/omnigen2/src/models/transformers/
block_lumina2.py`` — LuminaRMSNormZero:47-79 (4-chunk scale/gate adaLN,
``x = rms(x) * (1 + scale_msa)``), LuminaFeedForward:131-179 (swiglu
linear_1/linear_3 -> linear_2), Lumina2CombinedTimestepCaptionEmbedding:
182-218 (256-d sinusoid -> min(dim,1024) MLP; RMSNorm+Linear caption embed),
LuminaLayerNormContinuous:82-128 (linear_1 scale, optional linear_2 out
proj); the block forward with tanh-gated sandwich norms is
``transformer_omnigen2.py:130-175`` and the 3-axis rope id scheme (caption
ids (i,i,i), image axis0 = caption length, axes 1/2 = row/col) is
``repo.py:66-108``. The reference drives it at
``toolkit/stable_diffusion_model.py:2207-2220`` (t reversed: model gets
1 - t; prediction negated).

TPU-first: one scanned stack for the 26 joint layers, static [cap | img]
sequence with a key-padding mask for short captions, per-sample rope angle
tables built inside jit from the dynamic caption lengths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.parallel.sharding import PartitionRule
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class Lumina2Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    dim: int = 2304
    n_layers: int = 26
    n_refiner_layers: int = 2
    n_heads: int = 24
    n_kv_heads: int = 8
    cap_feat_dim: int = 2304  # gemma2-2b hidden
    ffn_hidden: int = 6144  # 256*ceil(2/3*4*2304/256) (diffusers LuminaFeedForward)
    axes_dims: tuple[int, ...] = (32, 32, 32)
    norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    adaln_embed_dim: int = 1024  # min(dim, 1024)
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.dim, self.adaln_embed_dim)

    @classmethod
    def tiny(cls, **kw) -> "Lumina2Config":
        base = dict(in_channels=4, out_channels=4, dim=32, n_layers=2,
                    n_refiner_layers=1, n_heads=2, n_kv_heads=1,
                    cap_feat_dim=24, ffn_hidden=64, axes_dims=(4, 6, 6),
                    scan_blocks=False, remat=False, dtype=jnp.float32,
                    param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)


def lumina2_pos_angles(
    cfg: Lumina2Config, hp: int, wp: int, cap_lens: jax.Array, t_max: int
) -> tuple[jax.Array, jax.Array]:
    """Rope angles for ([B, T_max, hd/2] caption, [B, N_img, hd/2] image).

    Reference id scheme (repo.py:66-108): caption token i -> (i, i, i) on all
    three axes; image token (r, c) -> (cap_len, r, c). Padded caption slots
    get ids beyond the true length — they are masked out of attention."""
    b = cap_lens.shape[0]
    n_img = hp * wp

    def omega(d: int) -> jax.Array:
        return 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))

    o0, o1, o2 = (omega(d) for d in cfg.axes_dims)
    ti = jnp.arange(t_max, dtype=jnp.float32)
    txt = jnp.concatenate([
        jnp.broadcast_to((ti[:, None] * o0[None])[None], (b, t_max, o0.shape[0])),
        jnp.broadcast_to((ti[:, None] * o1[None])[None], (b, t_max, o1.shape[0])),
        jnp.broadcast_to((ti[:, None] * o2[None])[None], (b, t_max, o2.shape[0])),
    ], axis=-1)
    ell = cap_lens.astype(jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(hp, dtype=jnp.float32),
                          jnp.arange(wp, dtype=jnp.float32), indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    img = jnp.concatenate([
        ell[:, None, None] * o0[None, None, :] * jnp.ones((1, n_img, 1)),
        jnp.broadcast_to((yy[:, None] * o1[None])[None], (b, n_img, o1.shape[0])),
        jnp.broadcast_to((xx[:, None] * o2[None])[None], (b, n_img, o2.shape[0])),
    ], axis=-1)
    return txt, img


def _apply_rope(x: jax.Array, ang: jax.Array) -> jax.Array:
    """Interleaved-pair complex rotation (diffusers lumina apply_rotary_emb)."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = jnp.cos(ang)[:, :, None]
    s = jnp.sin(ang)[:, :, None]
    oe = xe * c - xo * s
    oo = xe * s + xo * c
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)


class Lumina2Attention(nn.Module):
    """diffusers Attention(qk_norm='rms_norm', GQA kv_heads) as driven by the
    lumina2 processor: per-head RMS on q/k, rope, kv-head repeat."""

    cfg: Lumina2Config

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
        q = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="q_norm")(q)
        k = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="k_norm")(k)
        q = _apply_rope(q, ang)
        k = _apply_rope(k, ang)
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=2)
            v = jnp.repeat(v, nh // nkv, axis=2)
        o = dot_product_attention(q, k, v, mask=mask).reshape(b, s, nh * hd)
        return Linear(cfg.dim, use_bias=False, dtype=dt, param_dtype=pdt, name="to_out")(o)


class Lumina2Block(nn.Module):
    """transformer_omnigen2.py:130-175 forward (== Lumina2TransformerBlock)."""

    cfg: Lumina2Config
    modulation: bool = True

    @nn.compact
    def __call__(self, x, ang, mask, temb=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        norm = lambda nm: RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name=nm)
        attn = Lumina2Attention(cfg, name="attn")
        if self.modulation:
            mod = Linear(4 * cfg.dim, dtype=dt, param_dtype=pdt, name="norm1_lin")(
                nn.silu(temb.astype(dt)))
            sc_a, g_a, sc_m, g_m = jnp.split(mod.astype(jnp.float32)[:, None], 4, axis=-1)
            g_a, g_m = jnp.tanh(g_a), jnp.tanh(g_m)
            h = (norm("norm1_norm")(x).astype(jnp.float32) * (1.0 + sc_a)).astype(dt)
            a = attn(h, ang, mask)
            x = x + (g_a * norm("norm2")(a).astype(jnp.float32)).astype(dt)
            h = (norm("ffn_norm1")(x).astype(jnp.float32) * (1.0 + sc_m)).astype(dt)
            f = self._ffn(h)
            x = x + (g_m * norm("ffn_norm2")(f).astype(jnp.float32)).astype(dt)
        else:
            a = attn(norm("norm1_norm")(x), ang, mask)
            x = x + norm("norm2")(a)
            f = self._ffn(norm("ffn_norm1")(x))
            x = x + norm("ffn_norm2")(f)
        return x

    def _ffn(self, h):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        w1 = Linear(cfg.ffn_hidden, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="ffn_w1")(h)
        w3 = Linear(cfg.ffn_hidden, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="ffn_w3")(h)
        return Linear(cfg.dim, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="ffn_w2")(nn.silu(w1) * w3)


class _L2Carry(nn.Module):
    cfg: Lumina2Config

    @nn.compact
    def __call__(self, x, ang, mask, temb):
        return Lumina2Block(self.cfg, name="block")(x, ang, mask, temb), None


class Lumina2DiT(nn.Module):
    cfg: Lumina2Config

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N_img, p*p*in] patch-major packed tokens
        cap: jax.Array,  # [B, T, cap_feat_dim] gemma2 states
        t: jax.Array,  # [B] in [0,1], ALREADY in lumina convention (1-t)
        cap_mask: jax.Array | None,  # [B, T] bool
        img_ang: jax.Array,  # [B, N_img, hd/2]
        cap_ang: jax.Array,  # [B, T, hd/2]
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n_img, _ = img.shape
        t_max = cap.shape[1]

        from ai_toolkit_tpu.models.flux_dit import MLPEmbedder

        t_sin = timestep_embedding(t, 256, time_factor=1.0).astype(dt)
        temb = MLPEmbedder(cfg.adaln_dim, dt, pdt, name="time_in")(t_sin)

        cap = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="cap_norm")(cap)
        cap = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="cap_proj")(cap)
        x = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="x_embedder")(img)

        if cap_mask is None:
            cap_mask = jnp.ones((b, t_max), bool)
        cap_mask = cap_mask.astype(bool)
        cmask = jnp.broadcast_to(cap_mask[:, None, None, :], (b, 1, t_max, t_max))
        for i in range(cfg.n_refiner_layers):
            cap = Lumina2Block(cfg, modulation=False, name=f"context_refiner_{i}")(
                cap, cap_ang, cmask)
        for i in range(cfg.n_refiner_layers):
            x = Lumina2Block(cfg, modulation=True, name=f"noise_refiner_{i}")(
                x, img_ang, None, temb)

        joint = jnp.concatenate([cap, x], axis=1)  # caption first (repo.py:73)
        ang = jnp.concatenate([cap_ang, img_ang], axis=1)
        key_ok = jnp.concatenate([cap_mask, jnp.ones((b, n_img), bool)], axis=1)
        s_all = t_max + n_img
        mask = jnp.broadcast_to(key_ok[:, None, None, :], (b, 1, s_all, s_all))

        if cfg.scan_blocks:
            remat_kwargs = {"prevent_cse": False}
            Carry = nn.remat(_L2Carry, **remat_kwargs) if cfg.remat else _L2Carry
            joint, _ = nn.scan(
                Carry, length=cfg.n_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="layers")(joint, ang, mask, temb)
        else:
            Blk = nn.remat(Lumina2Block) if cfg.remat else Lumina2Block
            for i in range(cfg.n_layers):
                joint = Blk(cfg, name=f"layer_{i}")(joint, ang, mask, temb)

        x = joint[:, t_max:]
        # LuminaLayerNormContinuous: LN(no affine, eps 1e-6) * (1 + linear_1(silu(temb)))
        scale = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="final_mod")(
            nn.silu(temb.astype(dt)))
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False, dtype=dt,
                         name="final_norm")(x)
        x = x * (1.0 + scale[:, None])
        p = cfg.patch_size
        return Linear(p * p * cfg.out_channels, dtype=dt, param_dtype=pdt,
                      name="final_proj")(x)


def lumina2_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    if scan_blocks:
        return [
            PartitionRule(r"layers/block/.*(to_q|to_k|to_v|w1|w3|norm1_lin)/kernel",
                          P(None, "fsdp", "tp")),
            PartitionRule(r"layers/block/.*(to_out|w2)/kernel", P(None, "tp", "fsdp")),
            PartitionRule(r"refiner_\d+/.*(to_q|to_k|to_v|w1|w3|norm1_lin)/kernel",
                          P("fsdp", "tp")),
            PartitionRule(r"refiner_\d+/.*(to_out|w2)/kernel", P("tp", "fsdp")),
            PartitionRule(r"cap_proj/kernel", P("fsdp", None)),
        ]
    return [
        PartitionRule(r"(to_q|to_k|to_v|w1|w3|norm1_lin)/kernel", P("fsdp", "tp")),
        PartitionRule(r"(to_out|w2)/kernel", P("tp", "fsdp")),
        PartitionRule(r"cap_proj/kernel", P("fsdp", None)),
    ]


def lumina2_lora_targets() -> list[str]:
    # mirrors the reference's lumina2 targeting (lora_special.py:695: layers,
    # noise_refiner, context_refiner)
    return [r"layers/", r"layer_\d+/", r"noise_refiner_\d+/", r"context_refiner_\d+/"]
