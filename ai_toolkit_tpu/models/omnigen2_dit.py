"""OmniGen2 transformer — exact OmniGen2Transformer2DModel.

Parity source: the reference vendors the full model at
``extensions_built_in/diffusion_models/omnigen2/src/models/transformers/
transformer_omnigen2.py`` (blocks are the Lumina2 NextDiT blocks from the
sibling ``block_lumina2.py`` — this file reuses the repo's golden-tested
``Lumina2Block``). What OmniGen2 adds on top of Lumina2
(transformer_omnigen2.py:253-339):

- a second patch embedder for VAE-encoded reference images
  (``ref_image_patch_embedder``) plus a learned ``image_index_embedding``
  [5, dim] added per reference image (:385),
- a third refiner stack ``ref_image_refiner`` run over each reference image
  separately (:412-414 batches refs as independent rows),
- GQA attention (num_kv_heads < heads) — already in Lumina2Block,
- the rope id scheme (repo.py:66-103): caption token i -> (i, i, i); each
  reference image's tokens get axis0 = a running ``pe_shift`` that starts at
  the caption length and advances by max(ref_h_tokens, ref_w_tokens) per
  reference; the noise image follows at the final shift,
- joint sequence ``[caption | ref images | image]`` (:585-590).

TPU-first: reference images are uniform-shaped per batch (the data pipeline
buckets them), so the per-sample python loops of the torch code collapse to
static reshapes ([B, R, N, D] <-> [B*R, N, D]); caption lengths stay dynamic
via in-jit angle tables like lumina2. The 32 main layers run under nn.scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.models.lumina2_dit import Lumina2Block, _L2Carry
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm
from ai_toolkit_tpu.parallel.sharding import PartitionRule
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class OmniGen2Config:
    # defaults are the released OmniGen2/OmniGen2 transformer config; the
    # importer overrides from transformer/config.json
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    dim: int = 2520
    n_layers: int = 32
    n_refiner_layers: int = 2
    n_heads: int = 21
    n_kv_heads: int = 7
    cap_feat_dim: int = 2048  # qwen2.5-vl-3b hidden
    ffn_hidden: int = 10240  # 256*ceil(4*2520/256) (LuminaFeedForward round-up)
    axes_dims: tuple[int, ...] = (40, 40, 40)
    norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    adaln_embed_dim: int = 1024  # min(dim, 1024)
    timestep_scale: float = 1.0
    max_ref_images: int = 5  # image_index_embedding rows
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
    def tiny(cls, **kw) -> "OmniGen2Config":
        base = dict(in_channels=4, out_channels=4, dim=32, n_layers=2,
                    n_refiner_layers=1, n_heads=2, n_kv_heads=1,
                    cap_feat_dim=24, ffn_hidden=64, axes_dims=(4, 6, 6),
                    scan_blocks=False, remat=False, dtype=jnp.float32,
                    param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)

    @classmethod
    def from_hf(cls, hf: dict, **kw) -> "OmniGen2Config":
        """Build from a diffusers transformer/config.json dict."""
        import math

        mult = hf.get("ffn_dim_multiplier") or 1.0
        m_of = hf.get("multiple_of", 256)
        dim = hf["hidden_size"]
        inner = int(mult * 4 * dim)
        base = dict(
            in_channels=hf.get("in_channels", 16),
            out_channels=hf.get("out_channels") or hf.get("in_channels", 16),
            patch_size=hf.get("patch_size", 2),
            dim=dim,
            n_layers=hf.get("num_layers", 32),
            n_refiner_layers=hf.get("num_refiner_layers", 2),
            n_heads=hf.get("num_attention_heads", 21),
            n_kv_heads=hf.get("num_kv_heads", 7),
            cap_feat_dim=hf.get("text_feat_dim", 2048),
            ffn_hidden=m_of * math.ceil(inner / m_of),
            axes_dims=tuple(hf.get("axes_dim_rope", (40, 40, 40))),
            norm_eps=hf.get("norm_eps", 1e-5),
            timestep_scale=float(hf.get("timestep_scale", 1.0)),
        )
        base.update(kw)
        return cls(**base)

    def _as_lumina(self):
        """Lumina2Config view for the shared block module (same field set)."""
        from ai_toolkit_tpu.models.lumina2_dit import Lumina2Config

        return Lumina2Config(
            in_channels=self.in_channels, out_channels=self.out_channels,
            patch_size=self.patch_size, dim=self.dim, n_layers=self.n_layers,
            n_refiner_layers=self.n_refiner_layers, n_heads=self.n_heads,
            n_kv_heads=self.n_kv_heads, cap_feat_dim=self.cap_feat_dim,
            ffn_hidden=self.ffn_hidden, axes_dims=self.axes_dims,
            norm_eps=self.norm_eps, rope_theta=self.rope_theta,
            adaln_embed_dim=self.adaln_embed_dim, scan_blocks=self.scan_blocks,
            remat=self.remat, dtype=self.dtype, param_dtype=self.param_dtype,
        )


def omnigen2_pos_angles(
    cfg: OmniGen2Config,
    hp: int,
    wp: int,
    cap_lens: jax.Array,
    t_max: int,
    ref_hw: tuple[int, int] | None = None,
    n_ref: int = 0,
):
    """Rope angle tables (repo.py:66-103 id scheme, uniform ref shapes).

    Returns ``(cap_ang [B,t_max,hd/2], img_ang [B,n_img,hd/2],
    ref_ang [B,n_ref,n_rtok,hd/2] | None)``. Caption token i -> (i,i,i);
    ref image j token (r,c) -> (cap_len + j*shift, r, c) with
    shift = max(ref_hp, ref_wp); noise image token (r,c) ->
    (cap_len + n_ref*shift, r, c)."""
    b = cap_lens.shape[0]
    n_img = hp * wp

    def omega(d: int) -> jax.Array:
        return 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))

    o0, o1, o2 = (omega(d) for d in cfg.axes_dims)

    def grid_ang(h, w, shift):  # shift [B] -> [B, h*w, hd/2]
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        yy, xx = yy.reshape(-1), xx.reshape(-1)
        n = h * w
        return jnp.concatenate([
            shift[:, None, None] * o0[None, None, :] * jnp.ones((1, n, 1)),
            jnp.broadcast_to((yy[:, None] * o1[None])[None], (b, n, o1.shape[0])),
            jnp.broadcast_to((xx[:, None] * o2[None])[None], (b, n, o2.shape[0])),
        ], axis=-1)

    ti = jnp.arange(t_max, dtype=jnp.float32)
    cap_ang = jnp.concatenate([
        jnp.broadcast_to((ti[:, None] * o[None])[None], (b, t_max, o.shape[0]))
        for o in (o0, o1, o2)
    ], axis=-1)

    ell = cap_lens.astype(jnp.float32)
    if ref_hw is None or n_ref == 0:
        return cap_ang, grid_ang(hp, wp, ell), None
    rhp, rwp = ref_hw
    step = float(max(rhp, rwp))
    ref_ang = jnp.stack(
        [grid_ang(rhp, rwp, ell + j * step) for j in range(n_ref)], axis=1)
    img_ang = grid_ang(hp, wp, ell + n_ref * step)
    return cap_ang, img_ang, ref_ang


class OmniGen2DiT(nn.Module):
    cfg: OmniGen2Config

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N_img, p*p*in] patch-major packed tokens
        cap: jax.Array,  # [B, T, cap_feat_dim] qwen2.5-vl states
        t: jax.Array,  # [B] in [0,1], ALREADY reversed (model gets 1-t)
        cap_mask: jax.Array | None,  # [B, T] bool
        img_ang: jax.Array,  # [B, N_img, hd/2]
        cap_ang: jax.Array,  # [B, T, hd/2]
        refs: jax.Array | None = None,  # [B, R, N_ref, p*p*in]
        ref_ang: jax.Array | None = None,  # [B, R, N_ref, hd/2]
    ) -> jax.Array:
        cfg = self.cfg
        lcfg = cfg._as_lumina()
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n_img, _ = img.shape
        t_max = cap.shape[1]

        from ai_toolkit_tpu.models.flux_dit import MLPEmbedder

        t_sin = timestep_embedding(t, 256, time_factor=cfg.timestep_scale).astype(dt)
        temb = MLPEmbedder(cfg.adaln_dim, dt, pdt, name="time_in")(t_sin)

        cap = RMSNorm(eps=cfg.norm_eps, dtype=dt, param_dtype=pdt, name="cap_norm")(cap)
        cap = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="cap_proj")(cap)
        x = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="x_embedder")(img)

        if cap_mask is None:
            cap_mask = jnp.ones((b, t_max), bool)
        cap_mask = cap_mask.astype(bool)
        cmask = jnp.broadcast_to(cap_mask[:, None, None, :], (b, 1, t_max, t_max))
        for i in range(cfg.n_refiner_layers):
            cap = Lumina2Block(lcfg, modulation=False, name=f"context_refiner_{i}")(
                cap, cap_ang, cmask)

        r = None
        if refs is not None:
            n_r = refs.shape[1]
            r = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="ref_embedder")(refs)
            idx_emb = self.param(
                "image_index_emb", nn.initializers.normal(0.02),
                (cfg.max_ref_images, cfg.dim), pdt)
            r = r + idx_emb[None, :n_r, None, :].astype(dt)

        for i in range(cfg.n_refiner_layers):
            x = Lumina2Block(lcfg, modulation=True, name=f"noise_refiner_{i}")(
                x, img_ang, None, temb)

        if r is not None:
            # each reference image refines as its own batch row
            # (transformer_omnigen2.py:395-414)
            n_r, n_rtok = r.shape[1], r.shape[2]
            rf = r.reshape(b * n_r, n_rtok, cfg.dim)
            ra = ref_ang.reshape(b * n_r, n_rtok, ref_ang.shape[-1])
            rtemb = jnp.repeat(temb, n_r, axis=0)
            for i in range(cfg.n_refiner_layers):
                rf = Lumina2Block(lcfg, modulation=True, name=f"ref_refiner_{i}")(
                    rf, ra, None, rtemb)
            r = rf.reshape(b, n_r * n_rtok, cfg.dim)
            ref_flat_ang = ref_ang.reshape(b, n_r * n_rtok, ref_ang.shape[-1])
            joint = jnp.concatenate([cap, r, x], axis=1)
            ang = jnp.concatenate([cap_ang, ref_flat_ang, img_ang], axis=1)
            key_ok = jnp.concatenate(
                [cap_mask, jnp.ones((b, n_r * n_rtok + n_img), bool)], axis=1)
        else:
            joint = jnp.concatenate([cap, x], axis=1)
            ang = jnp.concatenate([cap_ang, img_ang], axis=1)
            key_ok = jnp.concatenate([cap_mask, jnp.ones((b, n_img), bool)], axis=1)

        s_all = joint.shape[1]
        mask = jnp.broadcast_to(key_ok[:, None, None, :], (b, 1, s_all, s_all))

        if cfg.scan_blocks:
            Carry = nn.remat(_L2Carry, prevent_cse=False) if cfg.remat else _L2Carry
            joint, _ = nn.scan(
                Carry, length=cfg.n_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: None},
            )(lcfg, name="layers")(joint, ang, mask, temb)
        else:
            Blk = nn.remat(Lumina2Block) if cfg.remat else Lumina2Block
            for i in range(cfg.n_layers):
                joint = Blk(lcfg, name=f"layer_{i}")(joint, ang, mask, temb)

        x = joint[:, s_all - n_img:]
        scale = Linear(cfg.dim, dtype=dt, param_dtype=pdt, name="final_mod")(
            nn.silu(temb.astype(dt)))
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False, dtype=dt,
                         name="final_norm")(x)
        x = x * (1.0 + scale[:, None])
        p = cfg.patch_size
        return Linear(p * p * cfg.out_channels, dtype=dt, param_dtype=pdt,
                      name="final_proj")(x)


def omnigen2_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
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


def omnigen2_lora_targets() -> list[str]:
    # reference get_transformer_block_names (omnigen2/__init__.py:339-344):
    # noise_refiner, context_refiner, layers (ref_image_refiner opt-in)
    return [r"layers/", r"layer_\d+/", r"noise_refiner_\d+/",
            r"context_refiner_\d+/"]
