"""FLUX-class rectified-flow DiT in Flax.

Architecture semantics match the reference's flux family (double-stream +
single-stream blocks, per-head QK RMSNorm, multi-axis RoPE, adaLN modulation
from timestep+pooled-text (+guidance) embeddings; cf. the vendored model the
reference trains via ``extensions_built_in/diffusion_models/flux2/``) but the
implementation is TPU-first:

- operates on pre-packed [B, N, 64] latent tokens (2x2 patchify is a host/VAE
  step), so every matmul is a large static-shape MXU op;
- joint text+image attention is one fused dot_product_attention call;
- modulation vectors are computed once per step and broadcast;
- ``remat`` per block (gradient checkpointing) and fsdp/tp partition rules
  are exported next to the model.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import AdaLayerNormZero, LayerNorm, Linear, RMSNorm, modulate
from ai_toolkit_tpu.ops.embeddings import TimestepEmbedder
from ai_toolkit_tpu.parallel.sharding import PartitionRule


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # 16 latent ch * 2*2 packing
    out_channels: int | None = None  # None -> in_channels (control models differ)
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    context_dim: int = 4096  # t5-xxl
    vec_dim: int = 768  # clip-l pooled
    axes_dim: tuple[int, ...] = (16, 56, 56)
    theta: float = 10_000.0
    guidance_embed: bool = True
    # extra packed latent channels concatenated to the image tokens
    # (flux-control / inpainting conditioning; reference flux_kontext/flex2)
    control_channels: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    # remat policy: 'full' recomputes the block; 'dots' saves matmul outputs
    # and recomputes only elementwise ops (more memory, less recompute)
    remat_policy: str = "full"
    # nn.scan over blocks: compile time O(1) in depth (params stacked [L, ...]);
    # the standard layout for deep DiT stacks on TPU.
    scan_blocks: bool = True
    # MoE FFN (hidream-class): DeepSeek-style routed SwiGLU experts with
    # unnormalized top-k softmax gates + a half-width shared expert
    # (reference: extensions_built_in/diffusion_models/hidream/src/models/moe.py).
    # 0 disables (dense GELU MLP, flux semantics).
    moe_experts: int = 0
    moe_top_k: int = 2
    # MoE dispatch mode: 'dense' (einsum combine, E× FLOPs, partitions over
    # an 'ep' mesh axis) or 'grouped' (Pallas gather-dispatch grouped GEMM,
    # top_k× FLOPs — production single-replica default for hidream)
    moe_dispatch: str = "dense"
    # FLUX.2 MLP: mlp_in emits 2x width, silu(x1)*x2 gate (vendored flux2
    # src/model.py SiLUActivation); single-block linear1 widens accordingly
    gated_mlp: bool = False
    # hidream semantics: QK RMSNorm over the full inner dim (not per head,
    # reference src/models/attention.py q_rms_norm = RMSNorm(inner_dim));
    # makes norm scales import 1:1 from hidream checkpoints
    qk_norm_across_heads: bool = False
    # explicit shared-expert width (hidream rounds 2/3*hidden to x256
    # separately for routed and shared; 0 -> mlp_dim // 2)
    moe_shared_hidden: int = 0
    # chroma semantics (reference chroma/src/model.py:118,210-228): all block
    # modulation vectors come from ONE small "Approximator" MLP over
    # (timestep_emb(16) | guidance_emb(16) | mod_index_emb(32)) instead of
    # per-block adaLN projections; time_in/vector_in/guidance_in are pruned.
    chroma_mod: bool = False
    approximator_hidden: int = 5120
    approximator_depth: int = 5
    # chroma_radiance (reference chroma/src/radiance.py): pixel-space chroma.
    # Image tokens are raw pixel_patch x pixel_patch pixel patches (c-major
    # packed, == torch unfold) through a patchify projection, and the final
    # layer is replaced by a NeRF-style decoder: per-pixel DCT positional
    # features + hyper-GLU MLPs whose weights are generated per token from
    # the trunk output, then an RMSNorm + 3x3 conv over the full image.
    nerf_head: bool = False
    pixel_patch: int = 16
    nerf_hidden: int = 64
    nerf_mlp_ratio: int = 4
    nerf_depth: int = 4
    nerf_max_freqs: int = 8
    # --- SD3/MMDiT semantics (diffusers SD3Transformer2DModel) ---
    # qk_norm=False: sd3-medium attention has no q/k RMSNorm (sd3.5 has it)
    qk_norm: bool = True
    # learned absolute position table [1, M*M, hidden] added after img_in,
    # center-cropped per resolution (diffusers PatchEmbed.cropped_pos_embed);
    # 0 disables (flux uses RoPE instead)
    pos_embed_max_size: int = 0
    # the LAST double block is context_pre_only: txt stream is normed by an
    # AdaLayerNormContinuous, contributes q/k/v to the joint attention, but
    # has no output projection / FFN (diffusers JointTransformerBlock)
    final_context_pre_only: bool = False
    # the first N double blocks carry a second img-only self-attention
    # (sd3.5-medium SD35AdaLayerNormZeroX: 9 modulation chunks + attn2)
    dual_attention_layers: int = 0
    # per-block marker set internally for the dual-attention prefix stack
    dual_attention: bool = False

    @classmethod
    def dev(cls) -> "FluxConfig":
        return cls()

    @classmethod
    def schnell(cls) -> "FluxConfig":
        return cls(guidance_embed=False)

    @classmethod
    def tiny(cls) -> "FluxConfig":
        return cls(
            in_channels=16, hidden_size=64, num_heads=4, head_dim=16, depth_double=2,
            depth_single=2, context_dim=64, vec_dim=64, axes_dim=(4, 6, 6),
            dtype=jnp.float32, param_dtype=jnp.float32, remat=False, scan_blocks=False,
        )

    @classmethod
    def bench_2b(cls) -> "FluxConfig":
        """~2B-param flux-shaped config that fits one v5e chip in bf16."""
        return cls(depth_double=4, depth_single=8)


class MLPEmbedder(nn.Module):
    hidden: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="in_layer")(x)
        return Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="out_layer")(
            nn.silu(x)
        )


class Approximator(nn.Module):
    """Chroma distilled-guidance layer (reference chroma/src/layers.py:390):
    in_proj -> n x (x + MLPEmbedder(RMSNorm(x))) -> out_proj."""

    cfg: "FluxConfig"

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        hh = cfg.approximator_hidden
        x = Linear(hh, dtype=dt, param_dtype=pdt, name="in_proj")(x.astype(dt))
        for i in range(cfg.approximator_depth):
            xn = RMSNorm(hh, dtype=dt, name=f"norm_{i}")(x)
            x = x + MLPEmbedder(hh, dt, pdt, name=f"layer_{i}")(xn)
        return Linear(cfg.hidden_size, dtype=dt, param_dtype=pdt, name="out_proj")(x)


def _l2_normalize(x: jax.Array, axis: int) -> jax.Array:
    """torch.nn.functional.normalize semantics: v / max(||v||_2, 1e-12)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, 1e-12)).astype(x.dtype)


class NerfGLUBlock(nn.Module):
    """Radiance hyper-MLP block (reference chroma/src/layers.py:300-341):
    a per-token GLU MLP over per-pixel features whose three weight matrices
    are generated from the trunk token and column (dim=-2) L2-normalized."""

    cfg: "FluxConfig"

    @nn.compact
    def __call__(self, x, s):
        # x: [B, N, P^2, nh] per-pixel features; s: [B, N, hidden] trunk tokens
        cfg = self.cfg
        nh = cfg.nerf_hidden
        mw = nh * cfg.nerf_mlp_ratio
        dt = cfg.dtype
        p = Linear(3 * nh * mw, dtype=dt, param_dtype=cfg.param_dtype,
                   name="param_generator")(s)
        g, v, o = jnp.split(p, 3, axis=-1)
        b, n = x.shape[:2]
        fc1_gate = _l2_normalize(g.reshape(b, n, nh, mw), axis=-2)
        fc1_value = _l2_normalize(v.reshape(b, n, nh, mw), axis=-2)
        fc2 = _l2_normalize(o.reshape(b, n, mw, nh), axis=-2)
        xn = RMSNorm(nh, dtype=dt, name="norm")(x)
        h = jax.nn.silu(jnp.einsum("bnpc,bncm->bnpm", xn, fc1_gate)) * jnp.einsum(
            "bnpc,bncm->bnpm", xn, fc1_value
        )
        return x + jnp.einsum("bnpm,bnmc->bnpc", h, fc2).astype(x.dtype)


class QKNorm(nn.Module):
    head_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q, k):
        q = RMSNorm(self.head_dim, dtype=self.dtype, name="query_norm")(q)
        k = RMSNorm(self.head_dim, dtype=self.dtype, name="key_norm")(k)
        return q, k


def _attend(q, k, v, pe, mask=None, extra_kv=None):
    """RoPE-rotate then joint attention. q,k,v: [B,S,H,D]; pe: [B,S,D/2,2,2];
    mask: [B,1,S,S] bool (key-padding; forces the XLA attention path).

    extra_kv: optional (k_ip [B,N,H,D], v_ip, scale) decoupled-KV adapter
    attention (reference vd_adapter.py CustomFluxVDAttnProcessor2_0:454-487 /
    ip_adapter.py CustomIPFluxAttnProcessor2_0): the SAME rope'd query attends
    to the adapter tokens and the scaled result adds to the base attention
    output before the out-projection."""
    from ai_toolkit_tpu.ops.rope import apply_rope

    q = apply_rope(q, pe)
    k = apply_rope(k, pe)
    out = dot_product_attention(q, k, v, mask=mask)
    if extra_kv is not None:
        ik, iv, iscale = extra_kv
        ip_out = dot_product_attention(q, ik, iv)
        out = out + (iscale * ip_out.astype(jnp.float32)).astype(out.dtype)
    return out


def _ip_kv(module, ip_tokens, nh, hd, dt):
    """Per-block decoupled-KV projections from the 'ip' collection
    (to_k/to_v [mid, hidden] + scale; reference to_k_adapter/to_k_ip).
    Returns (k, v, scale) or None when the block carries no adapter."""
    if ip_tokens is None or not module.has_variable("ip", "to_k"):
        return None
    wk = module.get_variable("ip", "to_k").astype(dt)
    wv = module.get_variable("ip", "to_v").astype(dt)
    scale = jnp.asarray(module.get_variable("ip", "scale"), jnp.float32)
    b, n = ip_tokens.shape[:2]
    k = (ip_tokens.astype(dt) @ wk).reshape(b, n, nh, hd)
    v = (ip_tokens.astype(dt) @ wv).reshape(b, n, nh, hd)
    return k, v, scale


class SwiGLU(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        g = Linear(self.hidden, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="w1")(x)
        u = Linear(self.hidden, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="w3")(x)
        return Linear(self.dim, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="w2")(
            jax.nn.silu(g) * u
        )


class _BankKernel(nn.Module):
    """Raw [E, in, out] expert-bank kernel (path-compatible with the
    nn.vmap(SwiGLU) layout: ``experts/<name>/kernel``). Reads the int8 quant
    collection when present, like ops.layers.Linear."""

    shape: tuple[int, ...]
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        if self.has_variable("quant", "qvalue"):
            qv = self.get_variable("quant", "qvalue")
            qs = self.get_variable("quant", "qscale")
            return qv.astype(self.param_dtype) * qs.astype(self.param_dtype)
        init = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,))
        return self.param("kernel", init, self.shape, self.param_dtype)


class _ExpertBankParams(nn.Module):
    dim: int
    hidden: int
    experts: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        e, d, h = self.experts, self.dim, self.hidden
        w1 = _BankKernel((e, d, h), self.param_dtype, name="w1")()
        w3 = _BankKernel((e, d, h), self.param_dtype, name="w3")()
        w2 = _BankKernel((e, h, d), self.param_dtype, name="w2")()
        return w1, w3, w2


class MoEFFN(nn.Module):
    """MoE FFN with two exact dropless dispatch modes.

    - ``dense``: every expert computes every token, gate-weighted einsum
      combine. E× FFN FLOPs but pure large MXU matmuls; right for tiny/test
      configs and for ep-sharded expert banks (XLA partitions the expert axis
      and inserts the combine psum).
    - ``grouped``: Pallas gather-dispatch grouped GEMM (ops/pallas/moe_gmm) —
      top_k× FLOPs, megablocks-style sorted-tile kernel. Production default
      for hidream-class models on TPU.

    Both modes share one parameter layout (``experts/w{1,3,2}/kernel``
    stacked [E, ...]), so checkpoints and importers are mode-agnostic.
    Reference semantics (top-k of unnormalized softmax gates + half-width
    shared expert): hidream ``src/models/moe.py``.
    """

    dim: int
    hidden: int
    experts: int
    top_k: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    shared_hidden: int = 0  # 0 -> hidden // 2
    dispatch: str = "dense"

    @nn.compact
    def __call__(self, x):
        scores = jax.nn.softmax(
            Linear(self.experts, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
                   name="gate")(x.astype(jnp.float32)),
            axis=-1,
        )
        topv, topi = jax.lax.top_k(scores, self.top_k)
        if self.dispatch == "grouped":
            from ai_toolkit_tpu.ops.pallas.moe_gmm import moe_dispatch_swiglu

            w1, w3, w2 = _ExpertBankParams(
                self.dim, self.hidden, self.experts, self.param_dtype, name="experts"
            )()
            routed = moe_dispatch_swiglu(
                x.astype(self.dtype), topv, topi,
                w1.astype(self.dtype), w3.astype(self.dtype), w2.astype(self.dtype),
            )
        else:
            # hidream/DeepSeek norm_topk_prob=False: raw softmax scores as gates
            gates = (
                jax.nn.one_hot(topi, self.experts, dtype=scores.dtype) * topv[..., None]
            ).sum(-2)
            ExpertBank = nn.vmap(
                SwiGLU,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0, "dora": 0, "lorm": 0, "quant": 0, "ctrl": 0},
                split_rngs={"params": True},
                in_axes=None,
                out_axes=0,
                axis_size=self.experts,
            )
            outs = ExpertBank(self.dim, self.hidden, self.dtype, self.param_dtype,
                              name="experts")(x)
            routed = jnp.einsum("ebsd,bse->bsd", outs.astype(jnp.float32), gates).astype(x.dtype)
        sh = self.shared_hidden or self.hidden // 2
        return routed + SwiGLU(self.dim, sh, self.dtype, self.param_dtype, name="shared")(x)


def _ffn(cfg: FluxConfig, x, name: str, moe: bool = True):
    """Block FFN: flux dense GELU MLP, or MoE SwiGLU when cfg.moe_experts > 0.

    moe=False on a MoE config gives a dense SwiGLU at the routed width —
    hidream's text-stream FFN (ff_t) is dense while the image stream routes."""
    mlp_dim = int(cfg.hidden_size * cfg.mlp_ratio)
    if cfg.moe_experts > 0:
        if not moe:
            return SwiGLU(cfg.hidden_size, mlp_dim, cfg.dtype, cfg.param_dtype,
                          name=f"{name}_swiglu")(x)
        return MoEFFN(cfg.hidden_size, mlp_dim, cfg.moe_experts, cfg.moe_top_k,
                      cfg.dtype, cfg.param_dtype, shared_hidden=cfg.moe_shared_hidden,
                      dispatch=cfg.moe_dispatch, name=f"{name}_moe")(x)
    if cfg.gated_mlp:
        h = Linear(2 * mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=f"{name}_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        act = jax.nn.silu(x1) * x2
    else:
        h = Linear(mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=f"{name}_in")(x)
        act = jax.nn.gelu(h, approximate=True)
    return Linear(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=f"{name}_out")(
        act
    )


class DoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, pe, mask=None, mod=None, ip_tokens=None):
        cfg = self.cfg
        dt = cfg.dtype
        pdt = cfg.param_dtype
        h = cfg.hidden_size
        nh, hd = cfg.num_heads, cfg.head_dim
        mlp_dim = int(h * cfg.mlp_ratio)

        del mlp_dim  # FFN width is resolved inside _ffn
        i_dual = None
        if mod is not None:
            # chroma: [B, 2(sets), 3(shift/scale/gate), h] per stream from the
            # approximator, no per-block projections
            im, tm = mod
            i_shift1, i_scale1, i_gate1 = im[:, 0, 0], im[:, 0, 1], im[:, 0, 2]
            i_shift2, i_scale2, i_gate2 = im[:, 1, 0], im[:, 1, 1], im[:, 1, 2]
            t_shift1, t_scale1, t_gate1 = tm[:, 0, 0], tm[:, 0, 1], tm[:, 0, 2]
            t_shift2, t_scale2, t_gate2 = tm[:, 1, 0], tm[:, 1, 1], tm[:, 1, 2]
        elif cfg.dual_attention:
            # SD35AdaLayerNormZeroX: 9 chunks, the extra 3 drive attn2
            (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2,
             i_shift3, i_scale3, i_gate3) = AdaLayerNormZero(
                h, 9, dtype=dt, param_dtype=pdt, name="img_mod")(vec)
            i_dual = (i_shift3, i_scale3, i_gate3)
            t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = AdaLayerNormZero(
                h, 6, dtype=dt, param_dtype=pdt, name="txt_mod"
            )(vec)
        else:
            i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = AdaLayerNormZero(
                h, 6, dtype=dt, param_dtype=pdt, name="img_mod"
            )(vec)
            t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = AdaLayerNormZero(
                h, 6, dtype=dt, param_dtype=pdt, name="txt_mod"
            )(vec)

        def qkv(x, prefix):
            b, s, _ = x.shape
            out = Linear(h * 3, dtype=dt, param_dtype=pdt, name=f"{prefix}_qkv")(x)
            if cfg.qk_norm_across_heads:
                q, k, v = jnp.split(out, 3, axis=-1)
                q, k = QKNorm(h, dt, name=f"{prefix}_qknorm")(q, k)
                return (q.reshape(b, s, nh, hd), k.reshape(b, s, nh, hd),
                        v.reshape(b, s, nh, hd))
            q, k, v = jnp.split(out.reshape(b, s, 3 * nh, hd), 3, axis=2)
            if cfg.qk_norm:
                q, k = QKNorm(hd, dt, name=f"{prefix}_qknorm")(q, k)
            return q, k, v

        img_ln = LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="img_norm1")(img)
        img_n = modulate(img_ln, i_shift1, i_scale1)
        txt_n = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="txt_norm1")(txt), t_shift1, t_scale1)
        iq, ik, iv = qkv(img_n, "img")
        tq, tk, tv = qkv(txt_n, "txt")
        # joint attention over [txt | img]
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = _attend(q, k, v, pe, mask, extra_kv=_ip_kv(self, ip_tokens, nh, hd, dt))
        s_txt = txt.shape[1]
        t_attn, i_attn = attn[:, :s_txt], attn[:, s_txt:]
        b = img.shape[0]

        img = img + i_gate1[:, None] * Linear(h, dtype=dt, param_dtype=pdt, name="img_proj")(
            i_attn.reshape(b, -1, nh * hd)
        )
        if i_dual is not None:
            # parallel img-only self-attention off the same pre-attn norm
            i_shift3, i_scale3, i_gate3 = i_dual
            img_n2 = modulate(img_ln, i_shift3, i_scale3)
            q2, k2, v2 = qkv(img_n2, "img2")
            a2 = _attend(q2, k2, v2, pe[:, s_txt:], mask=None)
            img = img + i_gate3[:, None] * Linear(
                h, dtype=dt, param_dtype=pdt, name="img2_proj"
            )(a2.reshape(b, -1, nh * hd))
        img_m = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="img_norm2")(img), i_shift2, i_scale2)
        img = img + i_gate2[:, None] * _ffn(cfg, img_m, "img_mlp")

        txt = txt + t_gate1[:, None] * Linear(h, dtype=dt, param_dtype=pdt, name="txt_proj")(
            t_attn.reshape(b, -1, nh * hd)
        )
        txt_m = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="txt_norm2")(txt), t_shift2, t_scale2)
        txt = txt + t_gate2[:, None] * _ffn(cfg, txt_m, "txt_mlp", moe=False)
        return img, txt


class FinalDoubleBlock(nn.Module):
    """SD3's last joint block (diffusers JointTransformerBlock with
    context_pre_only=True): the txt stream is normed by an
    AdaLayerNormContinuous (scale, shift — diffusers chunk order), feeds
    q/k/v into the joint attention, but has no output projection or FFN;
    only the img stream continues."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, pe, mask=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

        i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = AdaLayerNormZero(
            h, 6, dtype=dt, param_dtype=pdt, name="img_mod")(vec)
        cm = Linear(2 * h, dtype=dt, param_dtype=pdt, name="txt_mod")(nn.silu(vec.astype(dt)))
        t_scale, t_shift = jnp.split(cm, 2, axis=-1)  # diffusers order: (scale, shift)

        def qkv(x, prefix):
            b, s, _ = x.shape
            out = Linear(h * 3, dtype=dt, param_dtype=pdt, name=f"{prefix}_qkv")(x)
            q, k, v = jnp.split(out.reshape(b, s, 3 * nh, hd), 3, axis=2)
            if cfg.qk_norm:
                q, k = QKNorm(hd, dt, name=f"{prefix}_qknorm")(q, k)
            return q, k, v

        img_n = modulate(
            LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="img_norm1")(img),
            i_shift1, i_scale1)
        txt_n = modulate(
            LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="txt_norm1")(txt),
            t_shift, t_scale)
        iq, ik, iv = qkv(img_n, "img")
        tq, tk, tv = qkv(txt_n, "txt")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = _attend(q, k, v, pe, mask)
        i_attn = attn[:, txt.shape[1]:]
        b = img.shape[0]
        img = img + i_gate1[:, None] * Linear(h, dtype=dt, param_dtype=pdt, name="img_proj")(
            i_attn.reshape(b, -1, nh * hd))
        img_m = modulate(
            LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="img_norm2")(img),
            i_shift2, i_scale2)
        return img + i_gate2[:, None] * _ffn(cfg, img_m, "img_mlp")


class SingleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, vec, pe, mask=None, mod=None, ip_tokens=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        mlp_dim = int(h * cfg.mlp_ratio)
        if cfg.moe_experts > 0:
            # hidream-style single block: separate attn + MoE FFN sublayers
            shift1, scale1, gate1, shift2, scale2, gate2 = AdaLayerNormZero(
                h, 6, dtype=dt, param_dtype=pdt, name="mod"
            )(vec)
            xn = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="pre_norm")(x), shift1, scale1)
            b, s, _ = xn.shape
            qkv = Linear(h * 3, dtype=dt, param_dtype=pdt, name="qkv")(xn)
            if cfg.qk_norm_across_heads:
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q, k = QKNorm(h, dt, name="qknorm")(q, k)
                q, k, v = (t.reshape(b, s, nh, hd) for t in (q, k, v))
            else:
                q, k, v = jnp.split(qkv.reshape(b, s, 3 * nh, hd), 3, axis=2)
                q, k = QKNorm(hd, dt, name="qknorm")(q, k)
            attn = _attend(q, k, v, pe, mask)
            x = x + gate1[:, None] * Linear(h, dtype=dt, param_dtype=pdt, name="proj")(
                attn.reshape(b, s, nh * hd)
            )
            xm = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="ffn_norm")(x), shift2, scale2)
            return x + gate2[:, None] * _ffn(cfg, xm, "mlp")
        if mod is not None:
            shift, scale, gate = mod[:, 0], mod[:, 1], mod[:, 2]  # chroma
        else:
            shift, scale, gate = AdaLayerNormZero(h, 3, dtype=dt, param_dtype=pdt, name="mod")(vec)
        xn = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="pre_norm")(x), shift, scale)
        b, s, _ = xn.shape
        # fused qkv + mlp-in projection (flux single-stream trick -> one big MXU matmul)
        mlp_w = 2 * mlp_dim if cfg.gated_mlp else mlp_dim
        lin1 = Linear(h * 3 + mlp_w, dtype=dt, param_dtype=pdt, name="linear1")(xn)
        qkv, mlp = lin1[..., : h * 3], lin1[..., h * 3 :]
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * nh, hd), 3, axis=2)
        q, k = QKNorm(hd, dt, name="qknorm")(q, k)
        attn = _attend(q, k, v, pe, mask, extra_kv=_ip_kv(self, ip_tokens, nh, hd, dt))
        if cfg.gated_mlp:
            m1, m2 = jnp.split(mlp, 2, axis=-1)
            act = jax.nn.silu(m1) * m2
        else:
            act = jax.nn.gelu(mlp, approximate=True)
        out = jnp.concatenate([attn.reshape(b, s, nh * hd), act], axis=-1)
        return x + gate[:, None] * Linear(h, dtype=dt, param_dtype=pdt, name="linear2")(out)


class _DoubleCarry(nn.Module):
    """nn.scan adapter: carry=(img, txt), broadcast (vec, pe)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, carry, vec, pe, mask, ip_tokens=None):
        img, txt = carry
        img, txt = DoubleBlock(self.cfg, name="block")(img, txt, vec, pe, mask,
                                                       ip_tokens=ip_tokens)
        return (img, txt), None


class _SingleCarry(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, vec, pe, mask, ip_tokens=None):
        return SingleBlock(self.cfg, name="block")(x, vec, pe, mask,
                                                   ip_tokens=ip_tokens), None


class _DoubleCarryMod(nn.Module):
    """chroma scan adapter: per-layer modulation slices scanned over axis 0."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, carry, pe, mask, mod):
        img, txt = carry
        img, txt = DoubleBlock(self.cfg, name="block")(img, txt, None, pe, mask, mod=mod)
        return (img, txt), None


class _SingleCarryMod(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, pe, mask, mod):
        return SingleBlock(self.cfg, name="block")(x, None, pe, mask, mod=mod), None


class FluxDiT(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # [B, N_img, in_channels] packed latent tokens
        txt: jax.Array,  # [B, N_txt, context_dim] t5 states
        t: jax.Array,  # [B] in [0, 1]
        y: jax.Array,  # [B, vec_dim] clip pooled
        pe: jax.Array,  # [B|1, N_txt+N_img, head_dim/2, 2, 2] rope table
        guidance: jax.Array | None = None,  # [B]
        txt_mask: jax.Array | None = None,  # [B, N_txt] bool (attn_masking)
        pos_ids: jax.Array | None = None,  # [N_img] int32 rows into pos_embed
        grid_hw: tuple[int, int] | None = None,  # (gh, gw) patch grid, nerf head
        img_mask: jax.Array | None = None,  # [B, N_img] bool (padded ref slots)
        ip_tokens: jax.Array | None = None,  # [B, N_ip, mid] adapter tokens
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        h = cfg.hidden_size

        raw_img = img  # nerf head re-reads the raw pixel patches
        img = Linear(h, dtype=dt, param_dtype=pdt, name="img_in")(img)
        if cfg.pos_embed_max_size:
            # sd3: learned absolute positions, center-cropped per resolution
            # (pos_ids precomputed host-side from the static latent shape)
            tab = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, cfg.pos_embed_max_size * cfg.pos_embed_max_size, h), pdt,
            )
            if pos_ids is None:
                pos_ids = jnp.arange(img.shape[1])
            img = img + tab[:, pos_ids].astype(dt)
        txt = Linear(h, dtype=dt, param_dtype=pdt, name="txt_in")(txt)
        vec = None
        sing_mod = img_mod = txt_mod = fin_mod = None
        if cfg.chroma_mod:
            # chroma: one Approximator produces every modulation vector
            # (singles | img doubles | txt doubles | final), indexed by a
            # sinusoidal mod-position embedding (reference model.py:205-228)
            from ai_toolkit_tpu.ops.embeddings import timestep_embedding

            dd, ds = cfg.depth_double, cfg.depth_single
            l_mod = 3 * ds + 2 * 6 * dd + 2
            b = img.shape[0]
            g = guidance if guidance is not None else jnp.zeros(t.shape, t.dtype)
            tg = jnp.concatenate(
                [timestep_embedding(t, 16), timestep_embedding(g, 16)], axis=-1
            )  # [B, 32]
            idx_emb = timestep_embedding(jnp.arange(l_mod, dtype=jnp.float32), 32)
            inp = jnp.concatenate(
                [jnp.broadcast_to(tg[:, None, :], (b, l_mod, 32)).astype(dt),
                 jnp.broadcast_to(idx_emb[None], (b, l_mod, 32)).astype(dt)], axis=-1
            )
            mods = Approximator(cfg, name="distilled_guidance")(inp)  # [B, L, h]
            sing_mod = mods[:, : 3 * ds].reshape(b, ds, 3, h)
            img_mod = mods[:, 3 * ds: 3 * ds + 6 * dd].reshape(b, dd, 2, 3, h)
            txt_mod = mods[:, 3 * ds + 6 * dd: 3 * ds + 12 * dd].reshape(b, dd, 2, 3, h)
            fin_mod = mods[:, -2:]
        else:
            vec = TimestepEmbedder(h, dtype=dt, param_dtype=pdt, name="time_in")(t)
            if cfg.guidance_embed:
                g = guidance if guidance is not None else jnp.full(t.shape, 4.0, t.dtype)
                vec = vec + TimestepEmbedder(h, dtype=dt, param_dtype=pdt, name="guidance_in")(g)
            vec = vec + MLPEmbedder(h, dt, pdt, name="vector_in")(y.astype(dt))

        mask = None
        if txt_mask is not None or img_mask is not None:
            # key-padding mask over [txt | img]: padded prompt tokens (and
            # padded multi-reference image slots) are invisible to everyone
            # (reference train.attn_masking; per-item img_shapes for edit_plus)
            b = img.shape[0]
            t_ok = (txt_mask.astype(bool) if txt_mask is not None
                    else jnp.ones((b, txt.shape[1]), bool))
            i_ok = (img_mask.astype(bool) if img_mask is not None
                    else jnp.ones((b, img.shape[1]), bool))
            key_ok = jnp.concatenate([t_ok, i_ok], axis=1)
            s_all = key_ok.shape[1]
            mask = jnp.broadcast_to(key_ok[:, None, None, :], (key_ok.shape[0], 1, s_all, s_all))

        if cfg.scan_blocks:
            scan_kwargs = dict(
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0, "dora": 0, "lorm": 0, "quant": 0, "ctrl": 0, "ip": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: None},
            )
            remat_kwargs = {"prevent_cse": False}
            if cfg.remat_policy == "dots":
                remat_kwargs["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy == "dots_flash":
                # dots + the flash-attention residuals (out/lse): backward
                # never re-runs the attention forward kernel
                remat_kwargs["policy"] = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse"),
                )
            if cfg.chroma_mod:
                # per-layer mod slices scan over axis 0: [L, B, ...]
                scan_kwargs["in_axes"] = (nn.broadcast, nn.broadcast, 0)
                DCarry = nn.remat(_DoubleCarryMod, **remat_kwargs) if cfg.remat else _DoubleCarryMod
                SCarry = nn.remat(_SingleCarryMod, **remat_kwargs) if cfg.remat else _SingleCarryMod
                if cfg.depth_double > 0:
                    dmods = (img_mod.transpose(1, 0, 2, 3, 4), txt_mod.transpose(1, 0, 2, 3, 4))
                    (img, txt), _ = nn.scan(DCarry, length=cfg.depth_double, **scan_kwargs)(
                        cfg, name="double_blocks"
                    )((img, txt), pe, mask, dmods)
                x = jnp.concatenate([txt, img], axis=1)
                if cfg.depth_single > 0:
                    x, _ = nn.scan(SCarry, length=cfg.depth_single, **scan_kwargs)(
                        cfg, name="single_blocks"
                    )(x, pe, mask, sing_mod.transpose(1, 0, 2, 3))
            else:
                import dataclasses as _dc

                DCarry = nn.remat(_DoubleCarry, **remat_kwargs) if cfg.remat else _DoubleCarry
                SCarry = nn.remat(_SingleCarry, **remat_kwargs) if cfg.remat else _SingleCarry
                n_final = 1 if cfg.final_context_pre_only else 0
                n_dual = cfg.dual_attention_layers
                n_main = cfg.depth_double - n_dual - n_final
                scan_kwargs["in_axes"] = (nn.broadcast,) * 4  # (+ ip_tokens)
                if n_dual > 0:
                    dcfg = _dc.replace(cfg, dual_attention=True)
                    (img, txt), _ = nn.scan(DCarry, length=n_dual, **scan_kwargs)(
                        dcfg, name="dual_blocks"
                    )((img, txt), vec, pe, mask, ip_tokens)
                if n_main > 0:
                    (img, txt), _ = nn.scan(DCarry, length=n_main, **scan_kwargs)(
                        cfg, name="double_blocks"
                    )((img, txt), vec, pe, mask, ip_tokens)
                if n_final:
                    img = FinalDoubleBlock(cfg, name="final_block")(img, txt, vec, pe, mask)
                x = jnp.concatenate([txt, img], axis=1)
                if cfg.depth_single > 0:
                    x, _ = nn.scan(SCarry, length=cfg.depth_single, **scan_kwargs)(
                        cfg, name="single_blocks"
                    )(x, vec, pe, mask, ip_tokens)
        else:
            import dataclasses as _dc

            DBlock = nn.remat(DoubleBlock) if cfg.remat else DoubleBlock
            SBlock = nn.remat(SingleBlock) if cfg.remat else SingleBlock
            n_final = 1 if cfg.final_context_pre_only else 0
            n_dual = 0 if cfg.chroma_mod else cfg.dual_attention_layers
            dcfg = _dc.replace(cfg, dual_attention=True) if n_dual else cfg
            for i in range(n_dual):
                img, txt = DBlock(dcfg, name=f"dual_{i}")(img, txt, vec, pe, mask,
                                                          ip_tokens=ip_tokens)
            for i in range(cfg.depth_double - n_dual - n_final):
                dm = (img_mod[:, i], txt_mod[:, i]) if cfg.chroma_mod else None
                img, txt = DBlock(cfg, name=f"double_{i}")(img, txt, vec, pe, mask,
                                                           mod=dm, ip_tokens=ip_tokens)
            if n_final:
                img = FinalDoubleBlock(cfg, name="final_block")(img, txt, vec, pe, mask)
            x = jnp.concatenate([txt, img], axis=1)
            for i in range(cfg.depth_single):
                sm = sing_mod[:, i] if cfg.chroma_mod else None
                x = SBlock(cfg, name=f"single_{i}")(x, vec, pe, mask, mod=sm,
                                                    ip_tokens=ip_tokens)
        x = x[:, txt.shape[1] :]

        if cfg.nerf_head:
            # radiance decoder (reference chroma/src/radiance.py:346-379):
            # fin_mod is computed by the approximator but unused (the
            # reference's final_layer is replaced by the NeRF head).
            return self._nerf_decode(x, raw_img, grid_hw)

        if cfg.chroma_mod:
            shift, scale = fin_mod[:, 0], fin_mod[:, 1]
        else:
            shift, scale = jnp.split(
                Linear(h * 2, dtype=dt, param_dtype=pdt, name="final_mod")(nn.silu(vec)), 2, axis=-1
            )
        x = modulate(LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="final_norm")(x), shift, scale)
        out_ch = cfg.out_channels or cfg.in_channels
        return Linear(out_ch, dtype=dt, param_dtype=pdt, name="final_proj")(x)

    def _nerf_decode(self, x, raw_img, grid_hw):
        """Radiance NeRF decoder (reference chroma/src/radiance.py:346-379).

        x: [B, N, hidden] trunk tokens; raw_img: [B, N, C*P^2] c-major packed
        pixel patches (== torch unfold layout); returns [B, H, W, C] pixels.
        """
        cfg = self.cfg
        pp = cfg.pixel_patch
        c_in = cfg.in_channels // (pp * pp)
        b, n, _ = x.shape
        # per-patch pixels, pixel-major channel-last (unfold -> [.., P^2, C])
        pix = raw_img.reshape(b, n, c_in, pp * pp).transpose(0, 1, 3, 2)
        # NerfEmbedder (layers.py:178-296): f32 math, DCT grid features
        from ai_toolkit_tpu.models.zimage_dit import _nerf_dct_features

        dct = jnp.asarray(_nerf_dct_features(pp, cfg.nerf_max_freqs))
        emb_in = jnp.concatenate(
            [pix.astype(jnp.float32),
             jnp.broadcast_to(dct[None, None], (b, n, *dct.shape))], axis=-1)
        hid = Linear(cfg.nerf_hidden, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="nerf_embedder")(emb_in).astype(cfg.dtype)
        Blk = nn.remat(NerfGLUBlock, prevent_cse=False) if cfg.remat else NerfGLUBlock
        for i in range(cfg.nerf_depth):
            hid = Blk(cfg, name=f"nerf_{i}")(hid, x)
        # NerfFinalLayerConv (layers.py:358-391): channel RMSNorm, fold back
        # to the pixel grid, 3x3 conv across patch boundaries
        hid = RMSNorm(cfg.nerf_hidden, dtype=cfg.dtype, name="nerf_final_norm")(hid)
        gh, gw = grid_hw if grid_hw is not None else (int(n ** 0.5),) * 2
        img = hid.reshape(b, gh, gw, pp, pp, cfg.nerf_hidden)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * pp, gw * pp, cfg.nerf_hidden)
        return nn.Conv(c_in, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="nerf_final_conv")(img)


# ---- sharding rules ----

def flux_partition_rules(scan_blocks: bool = True) -> list[PartitionRule]:
    """TP rules for the DiT: column-split qkv/mlp-in, row-split proj/mlp-out.

    Scanned layout has a leading layer axis on block kernels. With tp=1
    meshes these validate to no-ops and the fsdp heuristic applies.
    """
    if scan_blocks:
        return [
            # expert parallel: routed-expert banks [L, E, in, out] split E over
            # 'ep' (tokens stay replicated over ep; XLA inserts the psum at the
            # gate-weighted combine). Gate + shared expert stay dense rules.
            PartitionRule(r"moe/experts/w[13]/kernel", P(None, "ep", "fsdp", "tp")),
            PartitionRule(r"moe/experts/w2/kernel", P(None, "ep", "tp", "fsdp")),
            PartitionRule(r"moe/shared/w[13]/kernel", P(None, "fsdp", "tp")),
            PartitionRule(r"moe/shared/w2/kernel", P(None, "tp", "fsdp")),
            PartitionRule(r"moe/gate/kernel", P()),
            PartitionRule(r"blocks/block/.*(qkv|mlp_in|linear1)/kernel", P(None, "fsdp", "tp")),
            PartitionRule(r"blocks/block/.*(proj|mlp_out|linear2)/kernel", P(None, "tp", "fsdp")),
            PartitionRule(r"blocks/block/.*mod/mod/kernel", P(None, "fsdp", "tp")),
            # sd3 final context-pre-only block is outside the scan (2-D kernels)
            PartitionRule(r"final_block/.*(qkv|mlp_in)/kernel", P("fsdp", "tp")),
            PartitionRule(r"final_block/.*(proj|mlp_out)/kernel", P("tp", "fsdp")),
            PartitionRule(r"txt_in/kernel", P("fsdp", None)),
            PartitionRule(r"pos_embed", P()),
        ]
    return [
        PartitionRule(r"moe/experts/w[13]/kernel", P("ep", "fsdp", "tp")),
        PartitionRule(r"moe/experts/w2/kernel", P("ep", "tp", "fsdp")),
        PartitionRule(r"moe/shared/w[13]/kernel", P("fsdp", "tp")),
        PartitionRule(r"moe/shared/w2/kernel", P("tp", "fsdp")),
        PartitionRule(r"moe/gate/kernel", P()),
        PartitionRule(r"(img|img2|txt)_qkv/kernel", P("fsdp", "tp")),
        PartitionRule(r"(img|txt)_mlp_in/kernel", P("fsdp", "tp")),
        PartitionRule(r"linear1/kernel", P("fsdp", "tp")),
        PartitionRule(r"(img|img2|txt)_proj/kernel", P("tp", "fsdp")),
        PartitionRule(r"(img|txt)_mlp_out/kernel", P("tp", "fsdp")),
        PartitionRule(r"linear2/kernel", P("tp", "fsdp")),
        PartitionRule(r"txt_in/kernel", P("fsdp", None)),
        PartitionRule(r"pos_embed", P()),
    ]


_FLUX_KEY_PATTERNS = [
    # (internal regex, external template) — BFL/ComfyUI flux module names.
    # Scanned layout (nn.scan): one stacked entry per module, '{L}' = layer index.
    (r"^double_blocks/block/img_qkv$", "double_blocks.{L}.img_attn.qkv"),
    (r"^double_blocks/block/txt_qkv$", "double_blocks.{L}.txt_attn.qkv"),
    (r"^double_blocks/block/img_proj$", "double_blocks.{L}.img_attn.proj"),
    (r"^double_blocks/block/txt_proj$", "double_blocks.{L}.txt_attn.proj"),
    (r"^double_blocks/block/img_mlp_in$", "double_blocks.{L}.img_mlp.0"),
    (r"^double_blocks/block/img_mlp_out$", "double_blocks.{L}.img_mlp.2"),
    (r"^double_blocks/block/txt_mlp_in$", "double_blocks.{L}.txt_mlp.0"),
    (r"^double_blocks/block/txt_mlp_out$", "double_blocks.{L}.txt_mlp.2"),
    (r"^double_blocks/block/img_mod/mod$", "double_blocks.{L}.img_mod.lin"),
    (r"^double_blocks/block/txt_mod/mod$", "double_blocks.{L}.txt_mod.lin"),
    (r"^single_blocks/block/linear1$", "single_blocks.{L}.linear1"),
    (r"^single_blocks/block/linear2$", "single_blocks.{L}.linear2"),
    (r"^single_blocks/block/mod/mod$", "single_blocks.{L}.modulation.lin"),
    # Unrolled layout (tiny/test configs)
    (r"^double_(\d+)/img_qkv$", "double_blocks.{0}.img_attn.qkv"),
    (r"^double_(\d+)/txt_qkv$", "double_blocks.{0}.txt_attn.qkv"),
    (r"^double_(\d+)/img_proj$", "double_blocks.{0}.img_attn.proj"),
    (r"^double_(\d+)/txt_proj$", "double_blocks.{0}.txt_attn.proj"),
    (r"^double_(\d+)/img_mlp_in$", "double_blocks.{0}.img_mlp.0"),
    (r"^double_(\d+)/img_mlp_out$", "double_blocks.{0}.img_mlp.2"),
    (r"^double_(\d+)/txt_mlp_in$", "double_blocks.{0}.txt_mlp.0"),
    (r"^double_(\d+)/txt_mlp_out$", "double_blocks.{0}.txt_mlp.2"),
    (r"^double_(\d+)/img_mod/mod$", "double_blocks.{0}.img_mod.lin"),
    (r"^double_(\d+)/txt_mod/mod$", "double_blocks.{0}.txt_mod.lin"),
    (r"^single_(\d+)/linear1$", "single_blocks.{0}.linear1"),
    (r"^single_(\d+)/linear2$", "single_blocks.{0}.linear2"),
    (r"^single_(\d+)/mod/mod$", "single_blocks.{0}.modulation.lin"),
    (r"^img_in$", "img_in"),
    (r"^txt_in$", "txt_in"),
    (r"^final_proj$", "final_layer.linear"),
    (r"^final_mod$", "final_layer.adaLN_modulation.1"),
]


def flux_lora_key_map(lora_or_params: dict) -> dict[str, str]:
    """internal '/'-joined paths -> external BFL dotted module names.

    Covers every module that can carry a LoRA; used by io/lora_file for
    kohya/peft/comfy export with reference-identical key layout.
    """
    import re as _re

    from ai_toolkit_tpu.adapters.lora import lora_paths as _lp

    out: dict[str, str] = {}
    try:
        paths = ["/".join(p) for p in _lp(lora_or_params)]
    except Exception:
        paths = []
    if not paths:
        paths = _all_module_paths(lora_or_params)
    for p in paths:
        for pat, tmpl in _FLUX_KEY_PATTERNS:
            m = _re.match(pat, p)
            if m:
                out[p] = tmpl.format(*m.groups()) if m.groups() else tmpl
                break
    return out


def _all_module_paths(params: dict, prefix: tuple[str, ...] = ()) -> list[str]:
    out = []
    for k, v in params.items():
        if isinstance(v, dict):
            if "kernel" in v or "a" in v:
                out.append("/".join(prefix + (k,)))
            else:
                out.extend(_all_module_paths(v, prefix + (k,)))
    return out


def flux_lora_targets() -> list[str]:
    """Default LoRA targeting (transformer blocks only, as the reference's
    transformer_only/only_if_contains defaults do for flux)."""
    return [r"double_blocks/", r"single_blocks/", r"double_\d+/", r"single_\d+/",
            r"dual_blocks/", r"dual_\d+/", r"final_block/"]


def flux_inverse_key_map(key_map: dict[str, str], depth_double: int, depth_single: int) -> dict:
    """external key -> 'internal#layer' (stacked) or internal (unrolled)."""
    inverse: dict[str, str] = {}
    for internal, ext in key_map.items():
        if "{L}" in ext:
            depth = depth_double if internal.startswith("double") else depth_single
            for l in range(depth):
                e = ext.replace("{L}", str(l))
                inverse[e] = f"{internal}#{l}"
                inverse[e.replace(".", "_")] = f"{internal}#{l}"
        else:
            inverse[ext] = internal
            inverse[ext.replace(".", "_")] = internal
    return inverse


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, H, W, C] VAE latents -> [B, (H/2)(W/2), 4C] tokens, feature order
    ``(ph pw c)`` — the *patch-major* convention (hidream patchify
    ``'B C (H p1) (W p2) -> B (H W) (p1 p2 C)'``, omnigen2, boogu, sd3
    unpatchify). Checkpoint-linear row order is arch-specific: flux-family /
    qwen / flux2 / auraflow checkpoints use the channel-major order — those
    wrappers must use :func:`pack_latents_cmajor` instead."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(tokens: jax.Array, h: int, w: int) -> jax.Array:
    """[B, N, 4C] -> [B, H, W, C] (patch-major inverse)."""
    b, n, c4 = tokens.shape
    c = c4 // 4
    x = tokens.reshape(b, h // 2, w // 2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def pack_latents_cmajor(latents: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, (H/2)(W/2), 4C] tokens with the BFL/diffusers
    channel-major feature order ``(c ph pw)`` (reference
    ``stable_diffusion_model.py:2144``, ``flex2/flex2.py:269``,
    ``qwen_image/qwen_image.py:332-339``, flux2 VAE ``'(c pi pj) i j'``).
    Real flux/qwen/flux2 checkpoints' img_in rows and final-proj columns are
    laid out in this order — using the patch-major pack with imported weights
    channel-scrambles every token. Channel-major also composes: concatenating
    latent channels (flex2's 49-ch inpaint+control composite) then packing
    equals packing each group and concatenating features."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [b, h2, w2, c, ph, pw]
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents_cmajor(tokens: jax.Array, h: int, w: int) -> jax.Array:
    """[B, N, 4C] -> [B, H, W, C] (channel-major inverse)."""
    b, n, c4 = tokens.shape
    c = c4 // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [b, h2, ph, w2, pw, c]
    return x.reshape(b, h, w, c)


def pack_pixels_cmajor(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)(W/p), C*p*p] c-major patch tokens — the
    torch ``unfold(kernel=p, stride=p)`` layout the radiance patchify conv
    (reference chroma/src/radiance.py:249-256) and its checkpoint expect."""
    b, h, w, c = x.shape
    t = x.reshape(b, h // p, p, w // p, p, c).transpose(0, 1, 3, 5, 2, 4)
    return t.reshape(b, (h // p) * (w // p), c * p * p)
