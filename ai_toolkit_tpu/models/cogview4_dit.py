"""CogView4 transformer — diffusers ``CogView4Transformer2DModel`` layout.

Parity target: the reference's cogview4 arch — the vendored wrapper
``toolkit/models/cogview4.py`` (load :125-131, predict :252-281: flow
matching with timestep 0..1000, original/target size + crop-coords
conditioning, GLM-4 text states, linear-dynamic-shift scheduler config
:45-59). The wrapper's quantization exclude list (:160-166) pins the block
module inventory: ``norm1`` (the 12-chunk joint adaLN), ``norm2`` /
``norm2_context`` (no-affine LNs for the shared FF), ``attn1.norm_q/norm_k``
(qk layer norms). The transformer internals mirror the public diffusers
CogView4 model the wrapper loads:

- patchify: channel-major ``(c ph pw)`` tokens -> Linear ``patch_embed.proj``;
  text projected by ``patch_embed.text_proj``; TEXT FIRST in the sequence.
- per-block ``CogView4AdaLayerNormZero``: no-affine LNs on both streams +
  ``Linear(time_embed_dim, 12d)`` producing interleaved (img, ctx) shift/
  scale/gate pairs for attn and mlp.
- one attention over [text | image] with per-head affine LN qk norm; 2-axis
  rope (half-split rotate) applied to the IMAGE part only.
- ONE shared FF (gelu-tanh) applied to both streams after their
  separately-modulated no-affine LNs.
- time/size conditioning: 256-d sinusoids of t and of the 6 size scalars
  (original, crop, target) -> timestep_embedder MLP + condition_embedder MLP
  (silu), summed into a ``time_embed_dim`` vector.
- final AdaLayerNormContinuous (silu -> Linear -> scale/shift on a no-affine
  LN) + biased proj_out.

Derivation note: the transformer source is NOT vendored in-reference; this
module + its torch-mirror golden encode the public diffusers layout from
documentation of that model. Checkpoint config.json drives all dims at
import time.

TPU-first: blocks run under ``nn.scan``; rope tables are built host-side from
static latent dims; the two modulated streams stay concatenated through
attention so the flash kernel sees one contiguous sequence.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.parallel.sharding import PartitionRule
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class CogView4Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_heads: int = 64
    head_dim: int = 40
    n_layers: int = 28
    text_embed_dim: int = 4096  # GLM-4 hidden
    time_embed_dim: int = 512
    condition_dim: int = 256
    rope_axes_dim: tuple[int, int] = (20, 20)  # sums to head_dim; angles (dh+dw)/2
    rope_theta: float = 10_000.0
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls, **kw) -> "CogView4Config":
        base = dict(in_channels=4, out_channels=4, num_heads=2, head_dim=16,
                    n_layers=2, text_embed_dim=24, time_embed_dim=32,
                    condition_dim=16, rope_axes_dim=(8, 8), scan_blocks=False,
                    remat=False, dtype=jnp.float32, param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)


def _ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def cogview4_rope(cfg: CogView4Config, hp: int, wp: int) -> np.ndarray:
    """Per-token rope angles [N, head_dim/2]: concat of row angles over
    rope_axes_dim[0]/2 freqs and col angles over rope_axes_dim[1]/2 freqs."""
    dh, dw = cfg.rope_axes_dim
    fh = 1.0 / (cfg.rope_theta ** (np.arange(0, dh, 2, dtype=np.float64) / dh))
    fw = 1.0 / (cfg.rope_theta ** (np.arange(0, dw, 2, dtype=np.float64) / dw))
    rows = np.repeat(np.arange(hp, dtype=np.float64), wp)
    cols = np.tile(np.arange(wp, dtype=np.float64), hp)
    ang = np.concatenate([rows[:, None] * fh[None], cols[:, None] * fw[None]], axis=1)
    return ang.astype(np.float32)


def _apply_rope_halfsplit(x: jax.Array, ang: jax.Array) -> jax.Array:
    """Half-split rotation (diffusers apply_rotary_emb use_real_unbind_dim=-2):
    x=[x1|x2] halves; out=[x1*cos - x2*sin | x2*cos + x1*sin]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2].astype(jnp.float32), x[..., d2:].astype(jnp.float32)
    c = jnp.cos(ang)[None, :, None]
    s = jnp.sin(ang)[None, :, None]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).astype(x.dtype)


class CogView4Attention(nn.Module):
    """One attention over [text | image]; per-head affine LN qk norm; rope on
    the image span only."""

    cfg: CogView4Config

    @nn.compact
    def __call__(self, x, t_txt: int, ang):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        nh, hd = cfg.num_heads, cfg.head_dim
        b, s, _ = x.shape
        kw = dict(dtype=dt, param_dtype=pdt)
        q = Linear(nh * hd, **kw, name="to_q")(x).reshape(b, s, nh, hd)
        k = Linear(nh * hd, **kw, name="to_k")(x).reshape(b, s, nh, hd)
        v = Linear(nh * hd, **kw, name="to_v")(x).reshape(b, s, nh, hd)
        # qk layer norm WITH affine (quantize-excluded modules => have params)
        from ai_toolkit_tpu.ops.layers import LayerNorm

        q = LayerNorm(eps=1e-5, dtype=dt, name="norm_q")(q)
        k = LayerNorm(eps=1e-5, dtype=dt, name="norm_k")(k)
        q_img = _apply_rope_halfsplit(q[:, t_txt:], ang)
        k_img = _apply_rope_halfsplit(k[:, t_txt:], ang)
        q = jnp.concatenate([q[:, :t_txt], q_img], axis=1)
        k = jnp.concatenate([k[:, :t_txt], k_img], axis=1)
        o = dot_product_attention(q, k, v)
        return Linear(cfg.hidden_size, **kw, name="to_out")(o.reshape(b, s, nh * hd))


class CogView4Block(nn.Module):
    cfg: CogView4Config

    @nn.compact
    def __call__(self, x, ctx, temb, ang):
        cfg = self.cfg
        dt = cfg.dtype
        d = cfg.hidden_size
        t_txt = ctx.shape[1]
        mod = Linear(12 * d, dtype=dt, param_dtype=cfg.param_dtype,
                     name="adaln")(nn.silu(temb.astype(dt)))
        (sh_a, csh_a, sc_a, csc_a, g_a, cg_a,
         sh_m, csh_m, sc_m, csc_m, g_m, cg_m) = jnp.split(
            mod.astype(jnp.float32)[:, None], 12, axis=-1)
        xm = (_ln(x) * (1.0 + sc_a) + sh_a).astype(dt)
        cm = (_ln(ctx) * (1.0 + csc_a) + csh_a).astype(dt)
        joint = jnp.concatenate([cm, xm], axis=1)  # text first
        a = CogView4Attention(cfg, name="attn1")(joint, t_txt, ang)
        a_ctx, a_img = a[:, :t_txt], a[:, t_txt:]
        x = x + (g_a * a_img.astype(jnp.float32)).astype(dt)
        ctx = ctx + (cg_a * a_ctx.astype(jnp.float32)).astype(dt)

        hm = (_ln(x) * (1.0 + sc_m) + sh_m).astype(dt)
        cmm = (_ln(ctx) * (1.0 + csc_m) + csh_m).astype(dt)
        ff_in = Linear(4 * d, dtype=dt, param_dtype=cfg.param_dtype, name="ff_in")
        ff_out = Linear(d, dtype=dt, param_dtype=cfg.param_dtype, name="ff_out")
        f_img = ff_out(nn.gelu(ff_in(hm), approximate=True))
        f_ctx = ff_out(nn.gelu(ff_in(cmm), approximate=True))  # SHARED ff
        x = x + (g_m * f_img.astype(jnp.float32)).astype(dt)
        ctx = ctx + (cg_m * f_ctx.astype(jnp.float32)).astype(dt)
        return x, ctx


class _CvCarry(nn.Module):
    cfg: CogView4Config

    @nn.compact
    def __call__(self, carry, temb, ang):
        x, ctx = carry
        x, ctx = CogView4Block(self.cfg, name="block")(x, ctx, temb, ang)
        return (x, ctx), None


class CogView4DiT(nn.Module):
    cfg: CogView4Config

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N, p*p*in] channel-major patch tokens
        txt: jax.Array,  # [B, T, text_embed_dim] GLM-4 states
        t: jax.Array,  # [B] timesteps on the 0..1000 scale (wrapper scales)
        ang: jax.Array,  # [N, head_dim/2] rope angles (cogview4_rope)
        original_size: jax.Array,  # [B, 2] (h, w) pixels
        target_size: jax.Array,  # [B, 2]
        crop_coords: jax.Array,  # [B, 2]
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d = cfg.hidden_size
        b = img.shape[0]

        x = Linear(d, dtype=dt, param_dtype=pdt, name="patch_proj")(img)
        ctx = Linear(d, dtype=dt, param_dtype=pdt, name="text_proj")(txt)

        from ai_toolkit_tpu.models.flux_dit import MLPEmbedder

        t_sin = timestep_embedding(t, 256, time_factor=1.0).astype(dt)
        temb = MLPEmbedder(cfg.time_embed_dim, dt, pdt, name="time_in")(t_sin)
        conds = jnp.concatenate([original_size, crop_coords, target_size], axis=1)
        c_sin = timestep_embedding(conds.reshape(-1), cfg.condition_dim,
                                   time_factor=1.0).astype(dt)
        c_sin = c_sin.reshape(b, 6 * cfg.condition_dim)
        # PixArtAlphaTextProjection(act="silu_fp32"-family): lin1 -> silu -> lin2
        cemb = Linear(cfg.time_embed_dim, dtype=dt, param_dtype=pdt,
                      name="cond_in")(c_sin)
        cemb = Linear(cfg.time_embed_dim, dtype=dt, param_dtype=pdt,
                      name="cond_out")(nn.silu(cemb))
        temb = temb + cemb

        if cfg.scan_blocks:
            Carry = nn.remat(_CvCarry, prevent_cse=False) if cfg.remat else _CvCarry
            (x, ctx), _ = nn.scan(
                Carry, length=cfg.n_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")((x, ctx), temb, ang)
        else:
            Blk = nn.remat(CogView4Block) if cfg.remat else CogView4Block
            for i in range(cfg.n_layers):
                x, ctx = Blk(cfg, name=f"block_{i}")(x, ctx, temb, ang)

        # AdaLayerNormContinuous(elementwise_affine=False)
        mod = Linear(2 * d, dtype=dt, param_dtype=pdt, name="final_mod")(
            nn.silu(temb.astype(dt)))
        scale, shift = jnp.split(mod.astype(jnp.float32)[:, None], 2, axis=-1)
        x = (_ln(x) * (1.0 + scale) + shift).astype(dt)
        p = cfg.patch_size
        return Linear(p * p * cfg.out_channels, dtype=dt, param_dtype=pdt,
                      name="final_proj")(x)


def cogview4_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    if scan_blocks:
        return [
            PartitionRule(r"blocks/block/.*(to_q|to_k|to_v|ff_in|adaln)/kernel",
                          P(None, "fsdp", "tp")),
            PartitionRule(r"blocks/block/.*(to_out|ff_out)/kernel",
                          P(None, "tp", "fsdp")),
            PartitionRule(r"text_proj/kernel", P("fsdp", None)),
        ]
    return [
        PartitionRule(r"(to_q|to_k|to_v|ff_in|adaln)/kernel", P("fsdp", "tp")),
        PartitionRule(r"(to_out|ff_out)/kernel", P("tp", "fsdp")),
        PartitionRule(r"text_proj/kernel", P("fsdp", None)),
    ]


def cogview4_lora_targets() -> list[str]:
    # reference targets CogView4Transformer2DModel (cogview4.py:77)
    return [r"blocks/", r"block_\d+/"]


_CV_KEY_PATTERNS: list[tuple[str, str]] = [
    (r"blocks/block/attn1/to_(q|k|v)$", "transformer_blocks.{L}.attn1.to_{W}"),
    (r"blocks/block/attn1/to_out$", "transformer_blocks.{L}.attn1.to_out.0"),
    (r"blocks/block/ff_in$", "transformer_blocks.{L}.ff.net.0.proj"),
    (r"blocks/block/ff_out$", "transformer_blocks.{L}.ff.net.2"),
    (r"blocks/block/adaln$", "transformer_blocks.{L}.norm1.linear"),
    (r"block_(\d+)/attn1/to_(q|k|v)$", "transformer_blocks.{i}.attn1.to_{W}"),
    (r"block_(\d+)/attn1/to_out$", "transformer_blocks.{i}.attn1.to_out.0"),
    (r"block_(\d+)/ff_in$", "transformer_blocks.{i}.ff.net.0.proj"),
    (r"block_(\d+)/ff_out$", "transformer_blocks.{i}.ff.net.2"),
    (r"block_(\d+)/adaln$", "transformer_blocks.{i}.norm1.linear"),
]


def cogview4_lora_key_map(lora_or_params: dict) -> dict[str, str]:
    """internal '/'-joined paths -> diffusers CogView4 module names ('{L}'
    kept for scanned stacks, expanded by the inverse map)."""
    import re as _re

    from ai_toolkit_tpu.models.flux_dit import _all_module_paths

    try:
        from ai_toolkit_tpu.adapters.lora import lora_paths as _lp

        paths = ["/".join(p) for p in _lp(lora_or_params)]
    except Exception:
        paths = []
    if not paths:
        paths = _all_module_paths(lora_or_params)
    out: dict[str, str] = {}
    for p in paths:
        for pat, tmpl in _CV_KEY_PATTERNS:
            m = _re.match(pat, p)
            if not m:
                continue
            g = list(m.groups())
            ext = tmpl
            if "{i}" in ext:
                ext = ext.replace("{i}", g.pop(0))
            if "{W}" in ext:
                ext = ext.replace("{W}", g.pop(0))
            out[p] = ext
            break
    return out


def cogview4_inverse_key_map(key_map: dict[str, str], n_layers: int) -> dict[str, str]:
    inverse: dict[str, str] = {}
    for internal, ext in key_map.items():
        if "{L}" in ext:
            for l in range(n_layers):
                e = ext.replace("{L}", str(l))
                inverse[e] = f"{internal}#{l}"
                inverse[e.replace(".", "_")] = f"{internal}#{l}"
        else:
            inverse[ext] = internal
            inverse[ext.replace(".", "_")] = internal
    return inverse
