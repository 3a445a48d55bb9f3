"""Krea 2 (K2) single-stream MMDiT — exact reimplementation + model wrapper.

Parity target: the vendored reference sources
``extensions_built_in/diffusion_models/krea2/src/mmdit.py`` (SingleStreamDiT:
one [text | image (| refs)] sequence through SingleStreamBlocks with
per-block ADDITIVE shared modulation (a zero-init [6f] parameter added to the
timestep vector), plus-one RMSNorms everywhere (scale stored zero-init,
applied as 1+scale), sigmoid-GATED attention (out = wo(attn * sigmoid(gate)))
with GQA (48 q / 12 kv heads) and per-head plus-one qk RMSNorms, BFL rope
over axes [hd-12u, 6u, 6u] θ=1e3, SwiGLU with mlpdim = int(2f/3)*multiplier
rounded up to 128, a TextFusionTransformer that runs 2 blocks across the
stacked TE layer axis, projects layers→1, then 2 refiner blocks over tokens,
(cos|sin) timestep embedding with tfactor 1e3 feeding tmlp/tproj, and a
plus-one-RMS LastLayer with an additive (2,f) SimpleModulation) and
``src/pipeline.py`` / ``krea2.py`` (Qwen-Image VAE (== wan21) latents
standardized by latents_mean/std, 2x2 patchify with (c,ph,pw) feature order,
text pos ids all-zero + image ids [0,y,x] + reference ids [i+1,y,x] at t=0
modulation, t = timestep/1000, velocity target noise - clean) and
``src/text_encoder.py`` (Qwen3-VL-4B text tower; hidden_states at layers
(2,5,...,35) stacked on a layer axis).

TPU-first notes: static shapes throughout (the reference's pad-to-256 exists
only to stabilize torch.compile shapes — masked and sliced off, so it is
numerically irrelevant and skipped here); blocks run under ``nn.scan`` with
remat; the rope table is precomputed host-side per bucket; ref-span t=0
modulation is a per-token select instead of span concatenation.
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
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.ops.rope import apply_rope, image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

# Qwen3-VL hidden_states indices stacked for conditioning (text_encoder.py)
KREA_SELECT_LAYERS: tuple[int, ...] = (2, 5, 8, 11, 14, 17, 20, 23, 26, 29, 32, 35)


@dataclass(frozen=True)
class KreaConfig:
    # SingleMMDiTConfig fields (krea2.py KREA2_MMDIT_CONFIG)
    features: int = 6144
    tdim: int = 256
    txtdim: int = 2560
    heads: int = 48
    kvheads: int = 12
    multiplier: int = 4
    layers: int = 28
    patch: int = 2
    channels: int = 16
    bias: bool = False
    theta: float = 1e3
    txtlayers: int = 12
    txtheads: int = 20
    txtkvheads: int = 20
    mlp_multiple: int = 128  # SwiGLU rounding multiple
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.features // self.heads

    @property
    def axes_dim(self) -> tuple[int, int, int]:
        hd = self.head_dim
        u = hd // 16
        return (hd - 12 * u, 6 * u, 6 * u)

    def mlp_dim(self, features: int) -> int:
        m = int(2 * features / 3) * self.multiplier
        mult = self.mlp_multiple
        return mult * ((m + mult - 1) // mult)

    @classmethod
    def tiny(cls) -> "KreaConfig":
        return cls(features=32, tdim=16, txtdim=64, heads=2, kvheads=1,
                   multiplier=2, layers=2, patch=2, channels=4, txtlayers=3,
                   txtheads=2, txtkvheads=2, mlp_multiple=8, remat=False,
                   dtype=jnp.float32)


def _rms_p1(x: jax.Array, scale: jax.Array, eps: float = 1e-5) -> jax.Array:
    """mmdit.py RMSNorm: scale stored zero-init, applied as (scale + 1),
    computed in f32 and cast back."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * (scale.astype(jnp.float32) + 1.0)).astype(x.dtype)


class _RMSp1(nn.Module):
    """Module wrapper for plus-one RMSNorm (param name 'scale', zero-init)."""

    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.zeros_init(),
                           (x.shape[-1],), self.param_dtype)
        return _rms_p1(x, scale, self.eps)


class KreaAttention(nn.Module):
    """mmdit.py Attention: GQA + per-head plus-one qk RMSNorm + BFL rope +
    sigmoid gate on the attention output before wo."""

    dim: int
    heads: int
    kvheads: int
    bias: bool
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, pe=None, mask=None):
        dt, pdt = self.dtype, self.param_dtype
        nh, nkv = self.heads, self.kvheads
        hd = self.dim // nh
        b, s, _ = x.shape
        q = Linear(nh * hd, use_bias=self.bias, dtype=dt, param_dtype=pdt, name="wq")(x)
        k = Linear(nkv * hd, use_bias=self.bias, dtype=dt, param_dtype=pdt, name="wk")(x)
        v = Linear(nkv * hd, use_bias=self.bias, dtype=dt, param_dtype=pdt, name="wv")(x)
        gate = Linear(self.dim, use_bias=self.bias, dtype=dt, param_dtype=pdt,
                      name="gate")(x)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        q = _rms_p1(q, self.param("q_norm", nn.initializers.zeros_init(), (hd,), pdt))
        k = _rms_p1(k, self.param("k_norm", nn.initializers.zeros_init(), (hd,), pdt))
        if pe is not None:
            q = apply_rope(q, pe)
            k = apply_rope(k, pe)
        if nkv != nh:
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        attn = dot_product_attention(q, k, v, mask=mask).reshape(b, s, nh * hd)
        attn = attn * jax.nn.sigmoid(gate)
        return Linear(self.dim, use_bias=self.bias, dtype=dt, param_dtype=pdt,
                      name="wo")(attn)


class KreaSwiGLU(nn.Module):
    cfg: KreaConfig
    features: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        inner = cfg.mlp_dim(self.features)
        g = Linear(inner, use_bias=cfg.bias, dtype=dt, param_dtype=pdt, name="gate")(x)
        u = Linear(inner, use_bias=cfg.bias, dtype=dt, param_dtype=pdt, name="up")(x)
        return Linear(self.features, use_bias=cfg.bias, dtype=dt, param_dtype=pdt,
                      name="down")(jax.nn.silu(g) * u)


class TextFusionBlock(nn.Module):
    """mmdit.py TextFusionBlock: unmodulated pre-norm attn + SwiGLU."""

    cfg: KreaConfig

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.cfg
        h = _RMSp1(param_dtype=cfg.param_dtype, name="prenorm")(x)
        x = x + KreaAttention(cfg.txtdim, cfg.txtheads, cfg.txtkvheads, cfg.bias,
                              cfg.dtype, cfg.param_dtype, name="attn")(h, None, mask)
        h = _RMSp1(param_dtype=cfg.param_dtype, name="postnorm")(x)
        return x + KreaSwiGLU(cfg, cfg.txtdim, name="mlp")(h)


class KreaBlock(nn.Module):
    """mmdit.py SingleStreamBlock. ``ref_sel`` is a per-token [B, S, 1]
    selector: 1 where the token uses the t=0 modulation (clean ref tokens),
    0 for the normal timestep modulation."""

    cfg: KreaConfig

    @nn.compact
    def __call__(self, x, vec, vec_ref, ref_sel, pe, mask):
        cfg = self.cfg
        f = cfg.features
        lin = self.param("mod_lin", nn.initializers.zeros_init(), (6 * f,),
                         cfg.param_dtype)
        m = (vec + lin.astype(vec.dtype)).astype(cfg.dtype)  # [B, 1, 6f]
        mods = jnp.split(m, 6, axis=-1)
        if ref_sel is not None:
            r = (vec_ref + lin.astype(vec.dtype)).astype(cfg.dtype)
            rmods = jnp.split(r, 6, axis=-1)
            mods = [jnp.where(ref_sel, rm, mm) for mm, rm in zip(mods, rmods)]
        prescale, preshift, pregate, postscale, postshift, postgate = mods

        h = _RMSp1(param_dtype=cfg.param_dtype, name="prenorm")(x)
        h = (1 + prescale) * h + preshift
        x = x + pregate * KreaAttention(f, cfg.heads, cfg.kvheads, cfg.bias,
                                        cfg.dtype, cfg.param_dtype,
                                        name="attn")(h, pe, mask)
        h = _RMSp1(param_dtype=cfg.param_dtype, name="postnorm")(x)
        h = (1 + postscale) * h + postshift
        return x + postgate * KreaSwiGLU(cfg, f, name="mlp")(h)


class _KreaCarry(nn.Module):
    cfg: KreaConfig

    @nn.compact
    def __call__(self, x, vec, vec_ref, ref_sel, pe, mask):
        return KreaBlock(self.cfg, name="block")(x, vec, vec_ref, ref_sel, pe, mask), None


def krea_temb(t: jax.Array, dim: int, period: float = 1e4,
              tfactor: float = 1e3) -> jax.Array:
    """mmdit.py temb: args (B,1,half) = t*tfactor * freqs, output (cos|sin)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = (t.astype(jnp.float32) * tfactor)[:, None, None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TextFusionTransformer(nn.Module):
    """2 layerwise blocks across the TE-layer axis, Linear(n→1) projector,
    2 refiner blocks over tokens (mmdit.py TextFusionTransformer)."""

    cfg: KreaConfig

    @nn.compact
    def __call__(self, x, txt_mask=None):
        cfg = self.cfg
        b, l, n, d = x.shape
        x = x.reshape(b * l, n, d)
        for i in range(2):
            x = TextFusionBlock(cfg, name=f"layerwise_{i}")(x, None)
        x = x.reshape(b, l, n, d).transpose(0, 1, 3, 2)  # [B, L, d, n]
        x = Linear(1, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   name="projector")(x)[..., 0]  # [B, L, d]
        mask = None
        if txt_mask is not None:
            mask = txt_mask.astype(bool)[:, None, None, :]
        for i in range(2):
            x = TextFusionBlock(cfg, name=f"refiner_{i}")(x, mask)
        return x


class KreaDiT(nn.Module):
    cfg: KreaConfig

    @nn.compact
    def __call__(self, img, context, t, pe, txt_mask=None, ref_len=0):
        """img: [B, L_img(+L_ref), C*p*p] packed tokens (refs appended last,
        clean, modulated at t=0); context: [B, Lt, n_layers, txtdim];
        t: [B] flow time in [0,1] (1 = noise); pe: rope table over the FULL
        [txt | img | refs] sequence; txt_mask: [B, Lt]; ref_len: static count
        of trailing reference tokens. Returns [B, L_img - is this minus refs,
        p*p*C] predictions for the noisy image tokens only."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        f = cfg.features
        b = img.shape[0]

        img = Linear(f, use_bias=True, dtype=dt, param_dtype=pdt, name="first")(
            img.astype(dt))

        tmlp_0 = Linear(f, dtype=dt, param_dtype=pdt, name="tmlp_0")
        tmlp_2 = Linear(f, dtype=dt, param_dtype=pdt, name="tmlp_2")
        tproj_1 = Linear(6 * f, dtype=dt, param_dtype=pdt, name="tproj_1")

        def time_vec(tt):
            v = tmlp_2(jax.nn.gelu(tmlp_0(krea_temb(tt, cfg.tdim).astype(dt)),
                                   approximate=True))  # [B, 1, f]
            return v, tproj_1(jax.nn.gelu(v, approximate=True))  # [B, 1, 6f]

        tvec, mod_vec = time_vec(t)

        context = TextFusionTransformer(cfg, name="txtfusion")(
            context.astype(dt), txt_mask)
        ctx = _RMSp1(param_dtype=pdt, name="txtmlp_norm")(context)
        ctx = Linear(f, dtype=dt, param_dtype=pdt, name="txtmlp_1")(ctx)
        ctx = Linear(f, dtype=dt, param_dtype=pdt, name="txtmlp_3")(
            jax.nn.gelu(ctx, approximate=True))

        n_txt, n_img = ctx.shape[1], img.shape[1]
        x = jnp.concatenate([ctx, img], axis=1)
        s = n_txt + n_img

        mask = None
        if txt_mask is not None:
            joint = jnp.concatenate(
                [txt_mask.astype(bool), jnp.ones((b, n_img), bool)], axis=1)
            mask = joint[:, None, None, :]

        mod_ref, ref_sel = None, None
        if ref_len:
            # clean ref tokens get t=0 modulation (index_timestep_zero)
            _, mod_ref = time_vec(jnp.zeros_like(t))
            ref_sel = (jnp.arange(s) >= (s - ref_len))[None, :, None]

        if cfg.scan_blocks:
            Carry = nn.remat(_KreaCarry, prevent_cse=False) if cfg.remat else _KreaCarry
            x, _ = nn.scan(
                Carry,
                length=cfg.layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 5,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")(x, mod_vec, mod_ref, ref_sel, pe, mask)
        else:
            for i in range(cfg.layers):
                x = KreaBlock(cfg, name=f"block_{i}")(
                    x, mod_vec, mod_ref, ref_sel, pe, mask)

        # LastLayer: additive (2, f) SimpleModulation on the t vector
        lin = self.param("last_mod_lin", nn.initializers.zeros_init(), (2, f), pdt)
        sm = tvec + lin[None].astype(tvec.dtype)  # [B, 2, f]
        scale, shift = sm[:, 0:1], sm[:, 1:2]
        x = (1 + scale) * _RMSp1(param_dtype=pdt, name="last_norm")(x) + shift
        x = Linear(cfg.patch ** 2 * cfg.channels, use_bias=True, dtype=dt,
                   param_dtype=pdt, name="last_linear")(x)
        return x[:, n_txt: s - ref_len]


def krea_pack(latents: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)(W/p), C*p*p] with (c, ph, pw) feature order
    (pipeline.py prepare: 'b c (h ph) (w pw) -> b (h w) (c ph pw)')."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, h', w', c, ph, pw]
    return x.reshape(b, (h // patch) * (w // patch), c * patch * patch)


def krea_unpack(tokens: jax.Array, h: int, w: int, patch: int) -> jax.Array:
    b, n, cpp = tokens.shape
    c = cpp // (patch * patch)
    x = tokens.reshape(b, h // patch, w // patch, c, patch, patch)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h, w, c)


def krea_lora_targets() -> list[str]:
    # krea2.py:386-390 excludes first/last/tmlp/tproj/txtfusion.projector
    return [r"blocks/block/(attn/(wq|wk|wv|wo|gate)|mlp/(gate|up|down))$",
            r"block_\d+/(attn/(wq|wk|wv|wo|gate)|mlp/(gate|up|down))$"]


def krea_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"attn/(wq|wk|wv|gate)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"mlp/(gate|up)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(attn/wo|mlp/down)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


@register_model
class Krea2Model(BaseTpuModel):
    """krea2 / krea2_edit: Qwen-Image (wan21) VAE, Qwen3-VL-4B stacked-layer
    conditioning, single-stream MMDiT velocity prediction."""

    arch = "krea2"
    archs = ["krea2"]
    is_flow_matching = True
    # krea2.py get_bucket_divisibility: VAE(8) * patch(2)
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        from ai_toolkit_tpu.models.wan_vae import WanVAE, WanVAEConfig

        # krea2.py:206: edit mode is a model_kwargs flag, not a separate arch
        self.is_edit = bool(config.model_kwargs.get("edit", False))
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.dit_config = KreaConfig.tiny()
            self.vae_config = WanVAEConfig.tiny()
            self.llm_config = LLMConfig.tiny(
                qk_head_norm=True, n_layers=3, collect_layers=(0, 1, 2))
            self.max_txt_len = 16
        else:
            kw = dict(config.model_kwargs.get("mmdit_config", {}))
            self.dit_config = KreaConfig(**{k: v for k, v in kw.items()
                                            if k in KreaConfig.__dataclass_fields__})
            self.vae_config = WanVAEConfig.wan21()
            te = self._te_config_json()
            base = LLMConfig.qwen3_2b()
            self.llm_config = LLMConfig(
                vocab_size=te.get("vocab_size", 151_936),
                d_model=te.get("hidden_size", 2560),
                n_layers=te.get("num_hidden_layers", 36),
                n_heads=te.get("num_attention_heads", 32),
                n_kv_heads=te.get("num_key_value_heads", 8),
                head_dim=te.get("head_dim", 128),
                d_ff=te.get("intermediate_size", 9728),
                rope_theta=float(te.get("rope_theta", 5_000_000.0)),
                rms_eps=float(te.get("rms_norm_eps", base.rms_eps)),
                qk_head_norm=True,
                # hidden_states[i] == output of layer i-1 in our collect loop
                collect_layers=tuple(i - 1 for i in KREA_SELECT_LAYERS),
            )
        self.dit = KreaDiT(self.dit_config)
        self.vae = WanVAE(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def _te_config_json(self) -> dict:
        import json
        import os

        for sub in ("text_encoder", "."):
            p = os.path.join(self.config.name_or_path or "", sub, "config.json")
            if os.path.isfile(p):
                with open(p) as f:
                    d = json.load(f)
                return d.get("text_config", d)
        return dict(self.config.model_kwargs.get("text_encoder_config", {}))

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        n_img, n_txt = 4, 8
        pe = self.rope_table(2 * cfg.patch, 2 * cfg.patch, n_txt)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n_img, cfg.channels * cfg.patch ** 2)),
            jnp.zeros((1, n_txt, cfg.txtlayers, cfg.txtdim)),
            jnp.zeros((1,)), pe, jnp.ones((1, n_txt), bool),
        )
        d = self.vae_config.spatial_downscale
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, 1, 2 * d, 2 * d, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"],
                "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and os.path.exists(path):
            from ai_toolkit_tpu.io.dit_importers import load_krea_checkpoint

            return load_krea_checkpoint(path, self)
        if path:
            raise FileNotFoundError(
                f"arch '{self.config.arch}': checkpoint '{path}' not found — "
                f"refusing to random-init a named model. Use name_or_path: \"\" "
                f"for architecture experiments from scratch."
            )
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        out = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        # [n_layers, B, L, d] -> [B, L, n_layers, d]
        txt = jnp.transpose(out["collected"], (1, 2, 0, 3))
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        p = self.dit_config.patch
        ids = image_position_ids(latent_h // p, latent_w // p, text_len=txt_len)
        table = multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim),
            self.dit_config.theta)
        if self.is_edit:
            # reference tokens: axis 0 = i+1 (ComfyUI Kontext index placement)
            cids = np.asarray(
                image_position_ids(latent_h // p, latent_w // p, text_len=0)).copy()
            cids[:, 0] = 1
            table = jnp.concatenate([
                table,
                multi_axis_rope(jnp.asarray(cids)[None],
                                list(self.dit_config.axes_dim),
                                self.dit_config.theta),
            ], axis=1)
        return table

    def predict(self, variables, noisy_latents, t, cond):
        p = self.dit_config.patch
        b, h, w, c = noisy_latents.shape
        img = krea_pack(noisy_latents, p)
        ref_len = 0
        if self.is_edit and cond.get("control_latents") is not None:
            ref = krea_pack(cond["control_latents"], p)
            ref_len = ref.shape[1]
            img = jnp.concatenate([img, ref], axis=1)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["pe"],
                             cond.get("txt_mask"), ref_len)
        return krea_unpack(out, h, w, p)

    def encode_images(self, variables, images, rng=None):
        from ai_toolkit_tpu.models.wan_vae import WanVAE

        lat = self.vae.apply({"params": variables["vae"]}, images[:, None], rng,
                             method=WanVAE.encode)
        return lat[:, 0]

    def decode_latents(self, variables, latents):
        from ai_toolkit_tpu.models.wan_vae import WanVAE

        out = self.vae.apply({"params": variables["vae"]}, latents[:, None],
                             method=WanVAE.decode)
        return out[:, 0]

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.spatial_downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        p = self.dit_config.patch
        return (h // p) * (w // p)

    def lora_targets(self):
        return krea_lora_targets()

    def partition_rules(self):
        return krea_partition_rules()
