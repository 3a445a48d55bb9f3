"""PixArt transformer — exact diffusers ``PixArtTransformer2DModel``.

Parity target: the reference's pixart / pixart_sigma archs
(``toolkit/stable_diffusion_model.py:486-536`` load via diffusers
``Transformer2DModel``, ``:2080-2128`` predict: integer DDPM timesteps,
``encoder_attention_mask`` additive bias, resolution/aspect micro-conds for
the alpha-1024 config, learned-sigma output split by the caller).

Module grammar (diffusers BasicTransformerBlock, norm_type="ada_norm_single"):
- adaLN-single: ONE shared ``silu -> Linear(d, 6d)`` over the combined
  timestep(+size) embedding; each block owns a [6, d] ``scale_shift_table``
  added to it (shift/scale/gate for attn and mlp).
- self-attn with q/k/v biases (attention_bias=True), NO qk norm;
  cross-attn applied WITHOUT a pre-norm (the PixArt quirk diffusers keeps:
  "For PixArt norm2 isn't applied here"); norm2 (no-affine LN) modulates the
  GELU-tanh FF.
- parameter-free 2D sincos position embedding with base_size/
  interpolation_scale rescaling (diffusers ``get_2d_sincos_pos_embed``:
  first half encodes the column coordinate, second half the row, each as
  [sin, cos]).
- final: [2, d] ``scale_shift_table`` + embedded timestep -> shift/scale on a
  no-affine LN, then proj_out to ``p*p*out_channels`` (out = 2*in: eps +
  learned sigma).

TPU-first: blocks run under ``nn.scan`` (per-block tables stacked [L, 6, d]),
tokens are channel-major ``(c ph pw)`` patches so the conv patchify folds to
one Linear, text mask is an additive bias fused into the attention logits.
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
class PixArtConfig:
    in_channels: int = 4
    patch_size: int = 2
    num_heads: int = 16
    head_dim: int = 72
    n_layers: int = 28
    caption_dim: int = 4096  # T5-XXL hidden
    sample_size: int = 128  # latent side the model was trained at
    interpolation_scale: int = 2
    micro_cond: bool = False  # alpha-1024 resolution/aspect embedders
    learned_sigma: bool = True  # out_channels = 2 * in_channels
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 if self.learned_sigma else 1)

    @property
    def base_size(self) -> int:
        return self.sample_size // self.patch_size

    @classmethod
    def tiny(cls, **kw) -> "PixArtConfig":
        base = dict(num_heads=2, head_dim=16, n_layers=2, caption_dim=24,
                    sample_size=8, interpolation_scale=1, scan_blocks=False,
                    remat=False, dtype=jnp.float32, param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)


def _ln(x: jax.Array) -> jax.Array:
    """LayerNorm(elementwise_affine=False, eps=1e-6) in fp32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + 1e-6)


def pixart_pos_embed(cfg: PixArtConfig, hp: int, wp: int) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed: [hp*wp, d], row-major tokens;
    emb = [sin(c*w), cos(c*w), sin(r*w), cos(r*w)] each d/4 wide."""
    d = cfg.hidden_size
    gh = np.arange(hp, dtype=np.float64) / (hp / cfg.base_size) / cfg.interpolation_scale
    gw = np.arange(wp, dtype=np.float64) / (wp / cfg.base_size) / cfg.interpolation_scale
    omega = 1.0 / (10000.0 ** (np.arange(d // 4, dtype=np.float64) / (d / 4.0)))
    col = np.repeat(gw[None, :], hp, axis=0).reshape(-1)  # token (r, c) -> c
    row = np.repeat(gh[:, None], wp, axis=1).reshape(-1)  # token (r, c) -> r
    oc = col[:, None] * omega[None]
    orow = row[:, None] * omega[None]
    return np.concatenate(
        [np.sin(oc), np.cos(oc), np.sin(orow), np.cos(orow)], axis=1
    ).astype(np.float32)


class PixArtAttention(nn.Module):
    """diffusers Attention(bias=True, no qk_norm); cross-attn when ctx given."""

    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, ctx=None, bias=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        nh, hd = cfg.num_heads, cfg.head_dim
        b, s, _ = x.shape
        src = x if ctx is None else ctx
        t = src.shape[1]
        kw = dict(dtype=dt, param_dtype=pdt)
        q = Linear(nh * hd, **kw, name="to_q")(x).reshape(b, s, nh, hd)
        k = Linear(nh * hd, **kw, name="to_k")(src).reshape(b, t, nh, hd)
        v = Linear(nh * hd, **kw, name="to_v")(src).reshape(b, t, nh, hd)
        if bias is not None:
            # additive text-padding bias [B, 1, 1, T] (diffusers -10000 mask)
            qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
            kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
            vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhsd,bhtd->bhst", qf, kf) / jnp.sqrt(hd) + bias
            o = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(logits, axis=-1), vf)
            o = o.transpose(0, 2, 1, 3).astype(dt)
        else:
            o = dot_product_attention(q, k, v)
        return Linear(cfg.hidden_size, **kw, name="to_out")(o.reshape(b, s, nh * hd))


class PixArtBlock(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, txt, t6, txt_bias):
        cfg = self.cfg
        dt = cfg.dtype
        d = cfg.hidden_size
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, d), cfg.param_dtype)
        mods = table.astype(jnp.float32)[None] + t6.astype(jnp.float32).reshape(-1, 6, d)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [mods[:, i][:, None] for i in range(6)]
        h = (_ln(x) * (1.0 + sc_a) + sh_a).astype(dt)
        x = x + (g_a * PixArtAttention(cfg, name="attn1")(h).astype(jnp.float32)).astype(dt)
        # PixArt quirk: no pre-norm on the cross-attention input
        x = x + PixArtAttention(cfg, name="attn2")(x, txt, txt_bias)
        h = (_ln(x) * (1.0 + sc_m) + sh_m).astype(dt)
        f = Linear(4 * d, dtype=dt, param_dtype=cfg.param_dtype, name="ff_in")(h)
        f = nn.gelu(f, approximate=True)
        f = Linear(d, dtype=dt, param_dtype=cfg.param_dtype, name="ff_out")(f)
        return x + (g_m * f.astype(jnp.float32)).astype(dt)


class _PxCarry(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, txt, t6, txt_bias):
        return PixArtBlock(self.cfg, name="block")(x, txt, t6, txt_bias), None


class PixArtDiT(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N, p*p*in] channel-major patch tokens
        txt: jax.Array,  # [B, T, caption_dim]
        t: jax.Array,  # [B] integer DDPM timesteps (0..999)
        hp: int,
        wp: int,
        txt_mask: jax.Array | None = None,  # [B, T] 1=real
        resolution: jax.Array | None = None,  # [B, 2] (h, w) pixels
        aspect_ratio: jax.Array | None = None,  # [B] h/w
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d = cfg.hidden_size
        b = img.shape[0]

        x = Linear(d, dtype=dt, param_dtype=pdt, name="patch_proj")(img)
        x = x + jnp.asarray(pixart_pos_embed(cfg, hp, wp), dt)[None]

        from ai_toolkit_tpu.models.flux_dit import MLPEmbedder

        # integer t, scale=1, flip_sin_to_cos, downscale_freq_shift=0
        t_sin = timestep_embedding(t, 256, time_factor=1.0).astype(dt)
        emb_t = MLPEmbedder(d, dt, pdt, name="time_in")(t_sin)  # embedded_timestep
        cond = emb_t
        if cfg.micro_cond:
            sz = d // 3
            res = jnp.zeros((b, 2)) if resolution is None else resolution
            ar = jnp.ones((b,)) if aspect_ratio is None else aspect_ratio
            r_sin = timestep_embedding(res.reshape(-1), 256, time_factor=1.0).astype(dt)
            r_emb = MLPEmbedder(sz, dt, pdt, name="res_in")(r_sin).reshape(b, 2 * sz)
            a_sin = timestep_embedding(ar.reshape(-1), 256, time_factor=1.0).astype(dt)
            a_emb = MLPEmbedder(sz, dt, pdt, name="ar_in")(a_sin).reshape(b, sz)
            cond = cond + jnp.concatenate([r_emb, a_emb], axis=-1)
        t6 = Linear(6 * d, dtype=dt, param_dtype=pdt, name="adaln_linear")(
            nn.silu(cond))

        # PixArtAlphaTextProjection: linear_1 -> gelu_tanh -> linear_2
        y = Linear(d, dtype=dt, param_dtype=pdt, name="caption_in")(txt)
        y = nn.gelu(y, approximate=True)
        y = Linear(d, dtype=dt, param_dtype=pdt, name="caption_out")(y)

        txt_bias = None
        if txt_mask is not None:
            txt_bias = ((1.0 - txt_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        if cfg.scan_blocks:
            Carry = nn.remat(_PxCarry, prevent_cse=False) if cfg.remat else _PxCarry
            x, _ = nn.scan(
                Carry, length=cfg.n_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")(x, y, t6, txt_bias)
        else:
            Blk = nn.remat(PixArtBlock) if cfg.remat else PixArtBlock
            for i in range(cfg.n_layers):
                x = Blk(cfg, name=f"block_{i}")(x, y, t6, txt_bias)

        table = self.param("head_table", nn.initializers.normal(0.02),
                           (2, d), pdt)
        mods = table.astype(jnp.float32)[None] + emb_t.astype(jnp.float32)[:, None]
        shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
        x = (_ln(x) * (1.0 + scale) + shift).astype(dt)
        p = cfg.patch_size
        return Linear(p * p * cfg.out_channels, dtype=dt, param_dtype=pdt,
                      name="final_proj")(x)


def pixart_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    if scan_blocks:
        return [
            PartitionRule(r"blocks/block/.*(to_q|to_k|to_v|ff_in)/kernel",
                          P(None, "fsdp", "tp")),
            PartitionRule(r"blocks/block/.*(to_out|ff_out)/kernel",
                          P(None, "tp", "fsdp")),
            PartitionRule(r"caption_in/kernel", P("fsdp", None)),
        ]
    return [
        PartitionRule(r"(to_q|to_k|to_v|ff_in)/kernel", P("fsdp", "tp")),
        PartitionRule(r"(to_out|ff_out)/kernel", P("tp", "fsdp")),
        PartitionRule(r"caption_in/kernel", P("fsdp", None)),
    ]


def pixart_lora_targets() -> list[str]:
    return [r"blocks/", r"block_\d+/"]


_PX_KEY_PATTERNS: list[tuple[str, str]] = [
    (r"blocks/block/attn(1|2)/to_(q|k|v)$", "transformer_blocks.{L}.attn{A}.to_{W}"),
    (r"blocks/block/attn(1|2)/to_out$", "transformer_blocks.{L}.attn{A}.to_out.0"),
    (r"blocks/block/ff_in$", "transformer_blocks.{L}.ff.net.0.proj"),
    (r"blocks/block/ff_out$", "transformer_blocks.{L}.ff.net.2"),
    (r"block_(\d+)/attn(1|2)/to_(q|k|v)$", "transformer_blocks.{i}.attn{A}.to_{W}"),
    (r"block_(\d+)/attn(1|2)/to_out$", "transformer_blocks.{i}.attn{A}.to_out.0"),
    (r"block_(\d+)/ff_in$", "transformer_blocks.{i}.ff.net.0.proj"),
    (r"block_(\d+)/ff_out$", "transformer_blocks.{i}.ff.net.2"),
]


def pixart_lora_key_map(lora_or_params: dict) -> dict[str, str]:
    """internal '/'-joined paths -> diffusers PixArt module names ('{L}' for
    scanned stacks)."""
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
        for pat, tmpl in _PX_KEY_PATTERNS:
            m = _re.match(pat, p)
            if not m:
                continue
            g = list(m.groups())
            ext = tmpl
            # group order follows the pattern: unrolled patterns capture the
            # layer index first ({i}); ff patterns have no {A}/{W} groups
            if "{i}" in ext:
                ext = ext.replace("{i}", g.pop(0))
            if "{A}" in ext:
                ext = ext.replace("{A}", g.pop(0))
            if "{W}" in ext:
                ext = ext.replace("{W}", g.pop(0))
            out[p] = ext
            break
    return out


def pixart_inverse_key_map(key_map: dict[str, str], n_layers: int) -> dict[str, str]:
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
