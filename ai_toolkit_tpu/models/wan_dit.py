"""Wan-class video DiT (t2v / i2v) in Flax.

Architecture semantics follow the reference's wan21/wan22 family
(``/root/reference/toolkit/models/wan21/``, plugin wan22_*): patchified 3D
latent tokens (t=1, h=2, w=2 patch), blocks of [self-attn with 3D RoPE ->
cross-attn to text -> FFN], each modulated by 6 adaLN params = shared
time-projection + per-block learned table; QK RMSNorm; flow-matching
objective. TPU-first: scan over blocks, one fused attention per block,
static frame-bucket shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import LayerNorm, Linear, RMSNorm
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.rope import apply_rope, multi_axis_rope
from ai_toolkit_tpu.parallel.sharding import PartitionRule


@dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    text_dim: int = 4096  # umt5-xxl
    freq_dim: int = 256
    patch_size: tuple[int, int, int] = (1, 2, 2)  # (t, h, w)
    axes_dim: tuple[int, ...] = (44, 42, 42)  # rope split of head_dim (t, h, w)
    i2v: bool = False
    img_cond_dim: int = 1280  # clip-vision hidden for i2v
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    scan_blocks: bool = True
    # sequence parallelism: when set, self-attention runs as ring attention
    # over this manual mesh axis (the model must be applied inside
    # jax.shard_map with tokens/pe sharded over it — see
    # wan_model.enable_sequence_parallel)
    sp_axis: str | None = None

    @classmethod
    def wan21_1_3b(cls) -> "WanConfig":
        return cls()

    @classmethod
    def wan21_14b(cls) -> "WanConfig":
        return cls(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)

    @classmethod
    def wan22_5b(cls) -> "WanConfig":
        """Wan2.2 TI2V-5B transformer (48-ch latents from the 16x 2.2 VAE)."""
        return cls(in_channels=48, dim=3072, ffn_dim=14336, num_heads=24,
                   num_layers=30)

    @classmethod
    def tiny(cls) -> "WanConfig":
        return cls(
            in_channels=4, dim=64, ffn_dim=128, num_heads=4, num_layers=2, text_dim=64,
            freq_dim=32, axes_dim=(8, 4, 4), dtype=jnp.float32, param_dtype=jnp.float32,
            remat=False, scan_blocks=False,
        )

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


class WanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, context, e, pe, context_img=None):
        """x: [B,N,dim]; context: [B,S,dim]; e: [B,6,dim] modulation; pe: rope;
        context_img: [B,S_img,dim] i2v image tokens (decoupled KV)."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d, nh, hd = cfg.dim, cfg.num_heads, cfg.head_dim
        # per-block learned modulation offset (reference wan 'modulation' param)
        mod_table = self.param("modulation", nn.initializers.normal(0.02), (6, d), jnp.float32)
        e = (e + mod_table[None]).astype(jnp.float32)
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = [
            e[:, i][:, None, :].astype(dt) for i in range(6)
        ]

        b, n, _ = x.shape
        # self attention with 3D rope. QK RMSNorm is across-heads (full inner
        # dim) — wan/diffusers `qk_norm="rms_norm_across_heads"` semantics, so
        # checkpoint norm scales ([dim]) import exactly.
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm1")(x)
        h = h * (1 + scale_sa) + shift_sa
        q = RMSNorm(d, dtype=dt, name="self_q_norm")(
            Linear(d, dtype=dt, param_dtype=pdt, name="self_q")(h)
        ).reshape(b, n, nh, hd)
        k = RMSNorm(d, dtype=dt, name="self_k_norm")(
            Linear(d, dtype=dt, param_dtype=pdt, name="self_k")(h)
        ).reshape(b, n, nh, hd)
        v = Linear(d, dtype=dt, param_dtype=pdt, name="self_v")(h).reshape(b, n, nh, hd)
        if cfg.sp_axis:
            from ai_toolkit_tpu.ops.ring_attention import ring_attention

            attn = ring_attention(apply_rope(q, pe), apply_rope(k, pe), v,
                                  axis_name=cfg.sp_axis)
        else:
            attn = dot_product_attention(apply_rope(q, pe), apply_rope(k, pe), v)
        x = x + gate_sa * Linear(d, dtype=dt, param_dtype=pdt, name="self_o")(
            attn.reshape(b, n, d)
        )

        # cross attention to text (no rope, no modulation — wan convention)
        h = LayerNorm(dtype=dt, name="norm2")(x)
        s = context.shape[1]
        q = RMSNorm(d, dtype=dt, name="cross_q_norm")(
            Linear(d, dtype=dt, param_dtype=pdt, name="cross_q")(h)
        ).reshape(b, n, nh, hd)
        k = RMSNorm(d, dtype=dt, name="cross_k_norm")(
            Linear(d, dtype=dt, param_dtype=pdt, name="cross_k")(context)
        ).reshape(b, s, nh, hd)
        v = Linear(d, dtype=dt, param_dtype=pdt, name="cross_v")(context).reshape(b, s, nh, hd)
        attn = dot_product_attention(q, k, v)
        if cfg.i2v and context_img is not None:
            # decoupled image KV (diffusers wan add_k_proj/add_v_proj): a
            # second softmax over the image tokens, summed with the text attn
            si = context_img.shape[1]
            ki = RMSNorm(d, dtype=dt, name="cross_k_img_norm")(
                Linear(d, dtype=dt, param_dtype=pdt, name="cross_k_img")(context_img)
            ).reshape(b, si, nh, hd)
            vi = Linear(d, dtype=dt, param_dtype=pdt, name="cross_v_img")(
                context_img
            ).reshape(b, si, nh, hd)
            attn = attn + dot_product_attention(q, ki, vi)
        x = x + Linear(d, dtype=dt, param_dtype=pdt, name="cross_o")(attn.reshape(b, n, d))

        # ffn
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="norm3")(x)
        h = h * (1 + scale_ff) + shift_ff
        h = Linear(cfg.ffn_dim, dtype=dt, param_dtype=pdt, name="ffn_in")(h)
        h = Linear(d, dtype=dt, param_dtype=pdt, name="ffn_out")(jax.nn.gelu(h, approximate=True))
        return x + gate_ff * h


class _WanCarry(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, context, e, pe, context_img=None):
        return WanBlock(self.cfg, name="block")(x, context, e, pe, context_img), None


class WanDiT(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, in_ch * pt*ph*pw] patchified latent tokens
        context: jax.Array,  # [B, S, text_dim] umt5 states
        t: jax.Array,  # [B] in [0, 1]
        pe: jax.Array,  # rope table [1|B, N, head_dim/2, 2, 2]
        img_cond: jax.Array | None = None,  # [B, S_img, img_cond_dim] (i2v)
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d = cfg.dim
        pt, ph, pw = cfg.patch_size
        patch_dim = cfg.in_channels * pt * ph * pw

        x = Linear(d, dtype=dt, param_dtype=pdt, name="patch_embedding")(x)
        ctx = Linear(d, dtype=dt, param_dtype=pdt, name="text_embedding_in")(context.astype(dt))
        ctx = Linear(d, dtype=dt, param_dtype=pdt, name="text_embedding_out")(nn.gelu(ctx))
        ic = None
        if cfg.i2v and img_cond is not None:
            # wan i2v MLPProj: LN -> Linear -> GELU -> Linear -> LN (diffusers
            # WanImageEmbedding norm1/ff/norm2), importable 1:1
            ic = LayerNorm(dtype=dt, name="img_emb_norm1")(img_cond.astype(dt))
            ic = Linear(cfg.img_cond_dim, dtype=dt, param_dtype=pdt, name="img_emb_in")(ic)
            ic = Linear(d, dtype=dt, param_dtype=pdt, name="img_emb_out")(nn.gelu(ic))
            ic = LayerNorm(dtype=dt, name="img_emb_norm2")(ic)

        temb = timestep_embedding(t, cfg.freq_dim).astype(dt)
        temb = Linear(d, dtype=dt, param_dtype=pdt, name="time_fc1")(temb)
        temb = Linear(d, dtype=dt, param_dtype=pdt, name="time_fc2")(nn.silu(temb))
        e = Linear(d * 6, dtype=dt, param_dtype=pdt, name="time_projection")(nn.silu(temb))
        e = e.reshape(e.shape[0], 6, d)

        if cfg.scan_blocks:
            Carry = nn.remat(_WanCarry, prevent_cse=False) if cfg.remat else _WanCarry
            x, _ = nn.scan(
                Carry,
                length=cfg.num_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0, "dora": 0, "lorm": 0, "quant": 0, "ctrl": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")(x, ctx, e, pe, ic)
        else:
            Block = nn.remat(WanBlock) if cfg.remat else WanBlock
            for i in range(cfg.num_layers):
                x = Block(cfg, name=f"block_{i}")(x, ctx, e, pe, ic)

        # head: adaLN (2 mods) + linear to patch_dim. Wan-exact form: the
        # learned table plus the raw time embedding (diffusers
        # WanTransformer3DModel head `scale_shift_table + temb`), so
        # checkpoint import is numerics-preserving.
        head_mod = self.param("head_modulation", nn.initializers.normal(0.02), (2, d), jnp.float32)
        he = (head_mod[None] + temb.astype(jnp.float32)[:, None]).astype(dt)
        h = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="head_norm")(x)
        h = h * (1 + he[:, 1][:, None]) + he[:, 0][:, None]
        return Linear(patch_dim, dtype=dt, param_dtype=pdt, name="head_out")(h)


def wan_patchify(latents: jax.Array, patch: tuple[int, int, int]) -> jax.Array:
    """[B, T, H, W, C] -> [B, N, C*pt*ph*pw] tokens (T-major order)."""
    b, tt, hh, ww, c = latents.shape
    pt, ph, pw = patch
    x = latents.reshape(b, tt // pt, pt, hh // ph, ph, ww // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (tt // pt) * (hh // ph) * (ww // pw), pt * ph * pw * c)


def wan_unpatchify(tokens: jax.Array, t: int, h: int, w: int, patch, channels: int) -> jax.Array:
    b = tokens.shape[0]
    pt, ph, pw = patch
    x = tokens.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, channels)


def wan_position_ids(t: int, h: int, w: int) -> jnp.ndarray:
    import numpy as np

    tt, yy, xx = np.meshgrid(np.arange(t), np.arange(h), np.arange(w), indexing="ij")
    ids = np.stack([tt.reshape(-1), yy.reshape(-1), xx.reshape(-1)], axis=-1).astype(np.int32)
    return jnp.asarray(ids)[None]


def wan_lora_targets() -> list[str]:
    return [r"blocks/", r"block_\d+/"]


def wan_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    if scan_blocks:
        return [
            PartitionRule(r"blocks/block/(self|cross)_(q|k|v)/kernel", P(None, "fsdp", "tp")),
            PartitionRule(r"blocks/block/(self|cross)_o/kernel", P(None, "tp", "fsdp")),
            PartitionRule(r"blocks/block/ffn_in/kernel", P(None, "fsdp", "tp")),
            PartitionRule(r"blocks/block/ffn_out/kernel", P(None, "tp", "fsdp")),
        ]
    return [
        PartitionRule(r"(self|cross)_(q|k|v)/kernel", P("fsdp", "tp")),
        PartitionRule(r"(self|cross)_o/kernel", P("tp", "fsdp")),
        PartitionRule(r"ffn_in/kernel", P("fsdp", "tp")),
        PartitionRule(r"ffn_out/kernel", P("tp", "fsdp")),
    ]
