"""AuraFlow transformer — exact diffusers ``AuraFlowTransformer2DModel``.

Parity target: the reference trains AuraFlow through diffusers
(``toolkit/stable_diffusion_model.py:572-636`` load, ``:2231-2243`` predict —
t in [0,1], t=1 noise) and vendors the patch embed it relies on in
``toolkit/models/auraflow.py:8-48`` (Linear over ``(c ph pw)`` channel-major
patch features + learned absolute ``pos_embed``; the ``view/permute(0,2,4,1,3,5)``
there pins the channel-major token order).  The transformer layout this module
mirrors is the diffusers AuraFlow model the reference imports
(``AuraFlowTransformer2DModel``): MMDiT "joint" blocks + single-stream DiT
blocks with the *sandwich* post-norm residual (attention output enters the
stream only through ``norm2 -> modulate -> ff``), bias-free linears
throughout, fp32 LayerNorms without affine (incl. per-head qk norm), SwiGLU
FFN (``silu(linear_1) * linear_2 -> out_projection``), 8 learned register
tokens prepended to the projected caption, 256-d sinusoid -> MLP timestep
embedding, and a norm-free pre-final scale/shift block.

TPU-first: both stacks run under ``nn.scan`` with params stacked ``[L, ...]``
(LoRA/quant collections handle the leading layer axis), fp32 norm chains stay
vectorized on the VPU, attention goes through the shared
``dot_product_attention`` (pallas flash on TPU), and the learned-pos-embed
center-crop selection is resolved at trace time from static latent dims.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.parallel.sharding import PartitionRule
from jax.sharding import PartitionSpec as P


def _find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


@dataclass(frozen=True)
class AuraFlowConfig:
    in_channels: int = 4
    out_channels: int = 4
    patch_size: int = 2
    num_heads: int = 12
    head_dim: int = 256
    n_double: int = 4  # num_mmdit_layers
    n_single: int = 32  # num_single_dit_layers
    context_dim: int = 2048  # joint_attention_dim (Pile-T5-XL hidden)
    pos_embed_max_size: int = 9216  # 96x96 patch grid (AuraFlow v0.3)
    n_register: int = 8
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def ffn_hidden(self) -> int:
        # AuraFlowFeedForward(dim, 4*dim): int(2*4d/3) rounded up to 256
        return _find_multiple(int(2 * (4 * self.hidden_size) / 3), 256)

    @classmethod
    def tiny(cls, **kw) -> "AuraFlowConfig":
        base = dict(num_heads=2, head_dim=16, n_double=2, n_single=2,
                    context_dim=24, pos_embed_max_size=64, n_register=2,
                    scan_blocks=False, remat=False, dtype=jnp.float32,
                    param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)


def _ln32(x: jax.Array) -> jax.Array:
    """FP32LayerNorm(elementwise_affine=False, bias=False, eps=1e-5)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + 1e-5)


class AuraFlowFF(nn.Module):
    """AuraFlowFeedForward: silu(linear_1(x)) * linear_2(x) -> out_projection."""

    cfg: AuraFlowConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        kw = dict(use_bias=False, dtype=dt, param_dtype=pdt)
        h = nn.silu(Linear(cfg.ffn_hidden, **kw, name="w1")(x)) * \
            Linear(cfg.ffn_hidden, **kw, name="w2")(x)
        return Linear(cfg.hidden_size, **kw, name="out")(h)


def _split6(mod: jax.Array):
    """AdaLayerNormZero chunk order: shift_a, scale_a, gate_a, shift_m,
    scale_m, gate_m."""
    return jnp.split(mod.astype(jnp.float32)[:, None], 6, axis=-1)


class AuraFlowAttention(nn.Module):
    """diffusers Attention driven by AuraFlowAttnProcessor2_0: bias-free
    projections, per-head fp32-LN qk norm (no affine), context concatenated
    FIRST along the sequence."""

    cfg: AuraFlowConfig
    joint: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array | None = None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        nh, hd = cfg.num_heads, cfg.head_dim
        b, s, _ = x.shape
        kw = dict(use_bias=False, dtype=dt, param_dtype=pdt)
        q = Linear(nh * hd, **kw, name="to_q")(x).reshape(b, s, nh, hd)
        k = Linear(nh * hd, **kw, name="to_k")(x).reshape(b, s, nh, hd)
        v = Linear(nh * hd, **kw, name="to_v")(x).reshape(b, s, nh, hd)
        q = _ln32(q).astype(dt)
        k = _ln32(k).astype(dt)
        if self.joint:
            t = ctx.shape[1]
            cq = Linear(nh * hd, **kw, name="add_q")(ctx).reshape(b, t, nh, hd)
            ck = Linear(nh * hd, **kw, name="add_k")(ctx).reshape(b, t, nh, hd)
            cv = Linear(nh * hd, **kw, name="add_v")(ctx).reshape(b, t, nh, hd)
            cq = _ln32(cq).astype(dt)
            ck = _ln32(ck).astype(dt)
            q = jnp.concatenate([cq, q], axis=1)
            k = jnp.concatenate([ck, k], axis=1)
            v = jnp.concatenate([cv, v], axis=1)
        o = dot_product_attention(q, k, v)
        if self.joint:
            o_ctx, o_img = o[:, :t], o[:, t:]
            return (
                Linear(cfg.hidden_size, **kw, name="to_out")(
                    o_img.reshape(b, s, nh * hd)),
                Linear(cfg.hidden_size, **kw, name="add_out")(
                    o_ctx.reshape(b, t, nh * hd)),
            )
        return Linear(cfg.hidden_size, **kw, name="to_out")(
            o.reshape(b, o.shape[1], nh * hd))


def _sandwich(x_res, attn_out, gate_a, shift_m, scale_m, gate_m, ff, dt):
    """The AuraFlow post-norm sandwich: the attention output reaches the
    stream only through norm2 -> modulate -> ff -> gate."""
    h = _ln32(x_res.astype(jnp.float32) + gate_a * attn_out.astype(jnp.float32))
    h = (h * (1.0 + scale_m) + shift_m).astype(dt)
    return x_res + (gate_m * ff(h).astype(jnp.float32)).astype(dt)


class AuraFlowJointBlock(nn.Module):
    cfg: AuraFlowConfig

    @nn.compact
    def __call__(self, x, ctx, temb):
        cfg = self.cfg
        kw = dict(use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        st = nn.silu(temb.astype(cfg.dtype))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = _split6(
            Linear(6 * cfg.hidden_size, **kw, name="norm1_lin")(st))
        csh_a, csc_a, cg_a, csh_m, csc_m, cg_m = _split6(
            Linear(6 * cfg.hidden_size, **kw, name="norm1_ctx_lin")(st))
        xm = (_ln32(x) * (1.0 + sc_a) + sh_a).astype(cfg.dtype)
        cm = (_ln32(ctx) * (1.0 + csc_a) + csh_a).astype(cfg.dtype)
        a_img, a_ctx = AuraFlowAttention(cfg, joint=True, name="attn")(xm, cm)
        ff = AuraFlowFF(cfg, name="ff")
        ffc = AuraFlowFF(cfg, name="ff_ctx")
        x = _sandwich(x, a_img, g_a, sh_m, sc_m, g_m, ff, cfg.dtype)
        ctx = _sandwich(ctx, a_ctx, cg_a, csh_m, csc_m, cg_m, ffc, cfg.dtype)
        return x, ctx


class AuraFlowSingleBlock(nn.Module):
    cfg: AuraFlowConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        kw = dict(use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = _split6(
            Linear(6 * cfg.hidden_size, **kw, name="norm1_lin")(
                nn.silu(temb.astype(cfg.dtype))))
        xm = (_ln32(x) * (1.0 + sc_a) + sh_a).astype(cfg.dtype)
        a = AuraFlowAttention(cfg, name="attn")(xm)
        ff = AuraFlowFF(cfg, name="ff")
        return _sandwich(x, a, g_a, sh_m, sc_m, g_m, ff, cfg.dtype)


class _JointCarry(nn.Module):
    cfg: AuraFlowConfig

    @nn.compact
    def __call__(self, carry, temb):
        x, ctx = carry
        x, ctx = AuraFlowJointBlock(self.cfg, name="block")(x, ctx, temb)
        return (x, ctx), None


class _SingleCarry(nn.Module):
    cfg: AuraFlowConfig

    @nn.compact
    def __call__(self, x, temb):
        return AuraFlowSingleBlock(self.cfg, name="block")(x, temb), None


def auraflow_pos_index(cfg: AuraFlowConfig, hp: int, wp: int) -> jnp.ndarray:
    """AuraFlowPatchEmbed.pe_selection_index_based_on_dim: center-crop the
    sqrt(max) x sqrt(max) learned grid to the hp x wp patch grid."""
    side = int(round(cfg.pos_embed_max_size ** 0.5))
    idx = jnp.arange(cfg.pos_embed_max_size).reshape(side, side)
    sh = side // 2 - hp // 2
    sw = side // 2 - wp // 2
    return idx[sh:sh + hp, sw:sw + wp].reshape(-1)


class AuraFlowDiT(nn.Module):
    cfg: AuraFlowConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N, p*p*in] CHANNEL-MAJOR packed tokens
        txt: jax.Array,  # [B, T, context_dim] Pile-T5 states (mask-zeroed)
        t: jax.Array,  # [B] in [0,1]; t=1 is noise
        hp: int,
        wp: int,
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d = cfg.hidden_size
        b = img.shape[0]

        pos = self.param("pos_embed", nn.initializers.normal(0.1),
                         (1, cfg.pos_embed_max_size, d), pdt)
        reg = self.param("register_tokens", nn.initializers.normal(0.02),
                         (1, cfg.n_register, d), pdt)

        x = Linear(d, dtype=dt, param_dtype=pdt, name="patch_proj")(img)
        x = x + jnp.take(pos.astype(dt), auraflow_pos_index(cfg, hp, wp), axis=1)

        from ai_toolkit_tpu.models.flux_dit import MLPEmbedder

        # Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0, scale=1000)
        t_sin = timestep_embedding(t, 256, time_factor=1000.0).astype(dt)
        temb = MLPEmbedder(d, dt, pdt, name="time_in")(t_sin)

        ctx = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt,
                     name="context_embedder")(txt)
        ctx = jnp.concatenate([jnp.broadcast_to(reg.astype(dt), (b, cfg.n_register, d)),
                               ctx], axis=1)

        scan_kw = dict(
            variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                           "dora": 0, "lorm": 0, "quant": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            metadata_params={nn.PARTITION_NAME: None},
        )
        if cfg.scan_blocks:
            JC = nn.remat(_JointCarry, prevent_cse=False) if cfg.remat else _JointCarry
            (x, ctx), _ = nn.scan(JC, length=cfg.n_double, **scan_kw)(
                cfg, name="joint")((x, ctx), temb)
        else:
            Blk = nn.remat(AuraFlowJointBlock) if cfg.remat else AuraFlowJointBlock
            for i in range(cfg.n_double):
                x, ctx = Blk(cfg, name=f"joint_{i}")(x, ctx, temb)

        t_ctx = ctx.shape[1]
        joint = jnp.concatenate([ctx, x], axis=1)  # context first
        if cfg.scan_blocks:
            SC = nn.remat(_SingleCarry, prevent_cse=False) if cfg.remat else _SingleCarry
            joint, _ = nn.scan(SC, length=cfg.n_single, **scan_kw)(
                cfg, name="single")(joint, temb)
        else:
            Blk = nn.remat(AuraFlowSingleBlock) if cfg.remat else AuraFlowSingleBlock
            for i in range(cfg.n_single):
                joint = Blk(cfg, name=f"single_{i}")(joint, temb)
        x = joint[:, t_ctx:]

        # AuraFlowPreFinalBlock: norm-free scale/shift from silu(temb)
        mod = Linear(2 * d, use_bias=False, dtype=dt, param_dtype=pdt,
                     name="final_mod")(nn.silu(temb.astype(dt)))
        scale, shift = jnp.split(mod, 2, axis=-1)
        x = x * (1.0 + scale[:, None]) + shift[:, None]
        p = cfg.patch_size
        return Linear(p * p * cfg.out_channels, use_bias=False, dtype=dt,
                      param_dtype=pdt, name="final_proj")(x)


def auraflow_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    if scan_blocks:
        return [
            PartitionRule(r"(joint|single)/block/.*(to_q|to_k|to_v|add_q|add_k|add_v|w1|w2|norm1_lin|norm1_ctx_lin)/kernel",
                          P(None, "fsdp", "tp")),
            PartitionRule(r"(joint|single)/block/.*(to_out|add_out|/out)/kernel",
                          P(None, "tp", "fsdp")),
            PartitionRule(r"context_embedder/kernel", P("fsdp", None)),
            PartitionRule(r"pos_embed", P(None, "fsdp", None)),
        ]
    return [
        PartitionRule(r"(to_q|to_k|to_v|add_q|add_k|add_v|w1|w2|norm1_lin|norm1_ctx_lin)/kernel",
                      P("fsdp", "tp")),
        PartitionRule(r"(to_out|add_out|/out)/kernel", P("tp", "fsdp")),
        PartitionRule(r"context_embedder/kernel", P("fsdp", None)),
        PartitionRule(r"pos_embed", P(None, "fsdp", None)),
    ]


def auraflow_lora_targets() -> list[str]:
    # reference targets the whole AuraFlowTransformer2DModel
    # (lora_special.py:689-690)
    return [r"joint/", r"single/", r"joint_\d+/", r"single_\d+/"]


_AURA_KEY_PATTERNS: list[tuple[str, str]] = [
    # internal path regex -> diffusers AuraFlowTransformer2DModel module name
    (r"joint(?:/block|_(\d+))/attn/to_(q|k|v)$", "joint_transformer_blocks.{L}.attn.to_{W}"),
    (r"joint(?:/block|_(\d+))/attn/add_(q|k|v)$", "joint_transformer_blocks.{L}.attn.add_{W}_proj"),
    (r"joint(?:/block|_(\d+))/attn/to_out$", "joint_transformer_blocks.{L}.attn.to_out.0"),
    (r"joint(?:/block|_(\d+))/attn/add_out$", "joint_transformer_blocks.{L}.attn.to_add_out"),
    (r"joint(?:/block|_(\d+))/ff/w1$", "joint_transformer_blocks.{L}.ff.linear_1"),
    (r"joint(?:/block|_(\d+))/ff/w2$", "joint_transformer_blocks.{L}.ff.linear_2"),
    (r"joint(?:/block|_(\d+))/ff/out$", "joint_transformer_blocks.{L}.ff.out_projection"),
    (r"joint(?:/block|_(\d+))/ff_ctx/w1$", "joint_transformer_blocks.{L}.ff_context.linear_1"),
    (r"joint(?:/block|_(\d+))/ff_ctx/w2$", "joint_transformer_blocks.{L}.ff_context.linear_2"),
    (r"joint(?:/block|_(\d+))/ff_ctx/out$", "joint_transformer_blocks.{L}.ff_context.out_projection"),
    (r"joint(?:/block|_(\d+))/norm1_lin$", "joint_transformer_blocks.{L}.norm1.linear"),
    (r"joint(?:/block|_(\d+))/norm1_ctx_lin$", "joint_transformer_blocks.{L}.norm1_context.linear"),
    (r"single(?:/block|_(\d+))/attn/to_(q|k|v)$", "single_transformer_blocks.{L}.attn.to_{W}"),
    (r"single(?:/block|_(\d+))/attn/to_out$", "single_transformer_blocks.{L}.attn.to_out.0"),
    (r"single(?:/block|_(\d+))/ff/w1$", "single_transformer_blocks.{L}.ff.linear_1"),
    (r"single(?:/block|_(\d+))/ff/w2$", "single_transformer_blocks.{L}.ff.linear_2"),
    (r"single(?:/block|_(\d+))/ff/out$", "single_transformer_blocks.{L}.ff.out_projection"),
    (r"single(?:/block|_(\d+))/norm1_lin$", "single_transformer_blocks.{L}.norm1.linear"),
]


def auraflow_lora_key_map(lora_or_params: dict) -> dict[str, str]:
    """internal '/'-joined paths -> diffusers dotted module names. Scanned
    stacks keep a '{L}' placeholder (expanded by the inverse map)."""
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
        for pat, tmpl in _AURA_KEY_PATTERNS:
            m = _re.match(pat, p)
            if m:
                idx = m.group(1)
                w = m.group(2) if m.re.groups > 1 else None
                ext = tmpl.replace("{L}", idx if idx is not None else "{L}")
                if w is not None:
                    ext = ext.replace("{W}", w)
                out[p] = ext
                break
    return out


def auraflow_inverse_key_map(key_map: dict[str, str], n_double: int,
                             n_single: int) -> dict[str, str]:
    """external key -> 'internal#layer' (stacked) or internal (unrolled)."""
    inverse: dict[str, str] = {}
    for internal, ext in key_map.items():
        if "{L}" in ext:
            depth = n_double if internal.startswith("joint") else n_single
            for l in range(depth):
                e = ext.replace("{L}", str(l))
                inverse[e] = f"{internal}#{l}"
                inverse[e.replace(".", "_")] = f"{internal}#{l}"
        else:
            inverse[ext] = internal
            inverse[ext.replace(".", "_")] = internal
    return inverse
