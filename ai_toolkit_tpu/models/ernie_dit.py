"""Ernie-Image DiT — exact reimplementation + model wrapper.

Parity target: the vendored reference sources
``extensions_built_in/diffusion_models/ernie_image/transformer.py``
(ErnieImageTransformer2DModel: single-stream DiT over [img, text] tokens,
ONE shared 6-way zero-init AdaLN modulation computed from the timestep for
all layers, per-head RMSNorm q/k, Megatron-style non-interleaved rope with
duplicated-adjacent angles over 3 axes (32,48,48) θ=256 where the image
tokens' axis-0 position equals the batch's text length, GELU(exact)-gated
FFN ``fc2(up(x) * gelu(gate(x)))``, paramless-LayerNorm final AdaLN with
(scale, shift) chunk order, zero-init final projection) and
``ernie_image.py`` (wrapper: AutoencoderKLFlux2 32-ch VAE whose latents are
2x2-patchified to 128 channels then standardized by the VAE's BatchNorm
running stats, Ernie-4.5 LLM text tower read at hidden_states[-2],
flow-matching target noise - latents, bucket divisibility 32).

TPU-first notes: tokens stay [B, S, D] with static shapes; the rope angles
are computed in-graph (they depend on per-sample text length, which is data,
not shape); blocks run under ``nn.scan`` (params stacked [L, ...]) with
remat; attention uses the shared dispatch with a [B,1,1,S] padding mask.
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
from ai_toolkit_tpu.ops.layers import Linear, RMSNorm
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@dataclass(frozen=True)
class ErnieConfig:
    # transformer/config.json keys (transformer.py:296-312)
    hidden_size: int = 3072
    num_attention_heads: int = 24
    num_layers: int = 24
    ffn_hidden_size: int = 8192
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    text_in_dim: int = 2560
    rope_theta: float = 256.0
    rope_axes_dim: tuple[int, int, int] = (32, 48, 48)
    eps: float = 1e-6
    qk_layernorm: bool = True
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls) -> "ErnieConfig":
        return cls(hidden_size=32, num_attention_heads=2, num_layers=2,
                   ffn_hidden_size=64, in_channels=8, out_channels=8,
                   text_in_dim=64, rope_axes_dim=(4, 6, 6), remat=False,
                   dtype=jnp.float32)


def _layer_norm(x: jax.Array, eps: float) -> jax.Array:
    """Paramless LayerNorm (elementwise_affine=False), f32 accumulate."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms_head(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """Per-head RMSNorm over head_dim with affine weight, f32 accumulate."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def ernie_rope_angles(cfg: ErnieConfig, hp: int, wp: int, text_lens: jax.Array,
                      t_max: int) -> jax.Array:
    """Per-token rope angles [B, S, head_dim/2] for the [img, txt] sequence.

    transformer.py forward: image ids = [text_len, y, x] (axis 0 is the
    VALID text length of that sample — data, not shape), text ids =
    [arange(Tmax), 0, 0]; per-axis ``rope(pos, dim, θ)`` emits dim/2 angles
    pos * θ^(-2i/dim), concatenated (16+24+24 = 64)."""
    b = text_lens.shape[0]
    n_img = hp * wp

    def omega(dim: int) -> jax.Array:
        return 1.0 / (cfg.rope_theta ** (
            jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))

    o0, o1, o2 = (omega(d) for d in cfg.rope_axes_dim)
    yy, xx = jnp.meshgrid(jnp.arange(hp, dtype=jnp.float32),
                          jnp.arange(wp, dtype=jnp.float32), indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    img = jnp.concatenate([
        text_lens.astype(jnp.float32)[:, None, None] * o0[None, None, :]
        * jnp.ones((1, n_img, 1)),
        jnp.broadcast_to((yy[:, None] * o1[None, :])[None], (b, n_img, o1.shape[0])),
        jnp.broadcast_to((xx[:, None] * o2[None, :])[None], (b, n_img, o2.shape[0])),
    ], axis=-1)
    tpos = jnp.arange(t_max, dtype=jnp.float32)
    txt = jnp.concatenate([
        jnp.broadcast_to((tpos[:, None] * o0[None, :])[None], (b, t_max, o0.shape[0])),
        jnp.zeros((b, t_max, o1.shape[0] + o2.shape[0])),
    ], axis=-1)
    return jnp.concatenate([img, txt], axis=1)  # [B, S, head_dim/2]


def _apply_ernie_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Megatron non-interleaved rotate_half with duplicated-adjacent angles
    (transformer.py apply_rotary_emb): freqs [θ0,θ0,θ1,θ1,...]; x1,x2 =
    chunk halves; out = x*cos + [-x2, x1]*sin, in x.dtype."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class ErnieBlock(nn.Module):
    """ErnieImageSharedAdaLNBlock (transformer.py:243-283)."""

    cfg: ErnieConfig

    @nn.compact
    def __call__(self, x, cos, sin, mod, mask):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d, nh, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
        b, s, _ = x.shape
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = mod

        res = x
        h = RMSNorm(eps=cfg.eps, dtype=dt, param_dtype=pdt, name="adaLN_sa_ln")(x)
        h = ((h.astype(jnp.float32) * (1.0 + sc_a) + sh_a)).astype(dt)
        q = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="to_q")(h)
        k = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="to_k")(h)
        v = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="to_v")(h)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        if cfg.qk_layernorm:
            q = _rms_head(q, self.param("q_norm", nn.initializers.ones_init(), (hd,), pdt), cfg.eps)
            k = _rms_head(k, self.param("k_norm", nn.initializers.ones_init(), (hd,), pdt), cfg.eps)
        # rope in x.dtype (cos_/sin_ .to(x.dtype) in the reference processor)
        q = _apply_ernie_rope(q, cos[:, :, None].astype(q.dtype), sin[:, :, None].astype(q.dtype))
        k = _apply_ernie_rope(k, cos[:, :, None].astype(k.dtype), sin[:, :, None].astype(k.dtype))
        attn = dot_product_attention(q, k, v, mask=mask).reshape(b, s, nh * hd)
        attn = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="to_out")(attn)
        x = res + (g_a * attn.astype(jnp.float32)).astype(dt)

        res = x
        h = RMSNorm(eps=cfg.eps, dtype=dt, param_dtype=pdt, name="adaLN_mlp_ln")(x)
        h = ((h.astype(jnp.float32) * (1.0 + sc_m) + sh_m)).astype(dt)
        gate = Linear(cfg.ffn_hidden_size, use_bias=False, dtype=dt, param_dtype=pdt,
                      name="gate_proj")(h)
        up = Linear(cfg.ffn_hidden_size, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="up_proj")(h)
        out = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="linear_fc2")(
            up * jax.nn.gelu(gate, approximate=False)
        )
        return res + (g_m * out.astype(jnp.float32)).astype(dt)


class _ErnieCarry(nn.Module):
    cfg: ErnieConfig

    @nn.compact
    def __call__(self, x, cos, sin, mod, mask):
        return ErnieBlock(self.cfg, name="block")(x, cos, sin, mod, mask), None


class ErnieDiT(nn.Module):
    cfg: ErnieConfig

    @nn.compact
    def __call__(self, x, txt, t, txt_mask=None):
        """x: [B, H, W, C] patchified latents; txt: [B, T, text_in_dim];
        t: [B] on the 0..1000 scale (reference passes scheduler timesteps);
        txt_mask: optional [B, T] validity. Returns [B, H, W, C_out]."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d, p = cfg.hidden_size, cfg.patch_size
        b, hh, ww, c = x.shape
        hp, wp = hh // p, ww // p
        n_img = hp * wp
        t_max = txt.shape[1]

        # x_embedder: Conv(k=p, s=p) then flatten row-major (H*W)
        img = nn.Conv(d, (p, p), strides=(p, p), use_bias=True, dtype=dt,
                      param_dtype=pdt, name="x_embedder")(x.astype(dt))
        img = img.reshape(b, n_img, d)
        if cfg.text_in_dim != d:
            txt = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt,
                         name="text_proj")(txt.astype(dt))
        else:
            txt = txt.astype(dt)
        seq = jnp.concatenate([img, txt], axis=1)

        if txt_mask is None:
            text_lens = jnp.full((b,), t_max, jnp.int32)
            valid_txt = jnp.ones((b, t_max), bool)
        else:
            valid_txt = txt_mask.astype(bool)
            text_lens = valid_txt.sum(axis=-1).astype(jnp.int32)
        mask = jnp.concatenate([jnp.ones((b, n_img), bool), valid_txt], axis=1)
        mask = mask[:, None, None, :]  # [B,1,1,S] — keys masked, all queries

        ang = ernie_rope_angles(cfg, hp, wp, text_lens, t_max)  # [B,S,hd/2]
        # duplicated-adjacent angle layout [θ0,θ0,θ1,θ1,...]
        ang = jnp.stack([ang, ang], axis=-1).reshape(b, ang.shape[1], -1)
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        # Timesteps(hidden, flip_sin_to_cos=False, shift=0): [sin | cos]
        half = d // 2
        freqs = jnp.exp(-np.log(10_000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        arg = t.astype(jnp.float32)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1).astype(dt)
        ctime = Linear(d, dtype=dt, param_dtype=pdt, name="time_in")(temb)
        ctime = Linear(d, dtype=dt, param_dtype=pdt, name="time_out")(nn.silu(ctime))

        # shared 6-way modulation, broadcast over the sequence (reference
        # zero-inits this linear — init_variables zeroes it post-init)
        modl = Linear(6 * d, dtype=dt, param_dtype=pdt,
                      name="adaLN_modulation")(nn.silu(ctime))
        mod = tuple(m[:, None].astype(jnp.float32) for m in jnp.split(modl, 6, axis=-1))

        if cfg.scan_blocks:
            Carry = nn.remat(_ErnieCarry, prevent_cse=False) if cfg.remat else _ErnieCarry
            seq, _ = nn.scan(
                Carry,
                length=cfg.num_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="layers")(seq, cos, sin, mod, mask)
        else:
            for i in range(cfg.num_layers):
                seq = ErnieBlock(cfg, name=f"layer_{i}")(seq, cos, sin, mod, mask)

        # final AdaLN: paramless LN, (scale, shift) chunk order
        fmod = Linear(2 * d, dtype=dt, param_dtype=pdt, name="final_mod")(ctime)
        f_scale, f_shift = jnp.split(fmod, 2, axis=-1)
        seq = _layer_norm(seq, cfg.eps) * (1 + f_scale[:, None]) + f_shift[:, None]
        out = Linear(p * p * cfg.out_channels, dtype=dt, param_dtype=pdt,
                     name="final_linear")(seq)[:, :n_img]

        # unpatchify (torch: view(B,Hp,Wp,p,p,C) -> B,C,H,W; ours NHWC)
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)


def ernie_lora_targets() -> list[str]:
    return [r"(to_q|to_k|to_v|to_out|gate_proj|up_proj|linear_fc2)$"]


def ernie_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(to_q|to_k|to_v|gate_proj|up_proj)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(to_out|linear_fc2)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


@register_model
class ErnieImageModel(BaseTpuModel):
    """ernie_image: flux2-class 32ch VAE latents, 2x2-patchified to 128ch and
    standardized by the VAE's BatchNorm running stats (ernie_image.py
    encode_images), Ernie-4.5 text tower at hidden_states[-2]."""

    arch = "ernie_image"
    archs = ["ernie_image"]
    is_flow_matching = True
    # ernie_image.py get_bucket_divisibility: 16 (vae+patchify) * 2
    bucket_divisibility = 32
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.dit_config = ErnieConfig.tiny()
            self.vae_config = VAEConfig.tiny(latent_channels=2)
            self.llm_config = LLMConfig.tiny(
                all_bias=True, rope_interleaved=True, collect_layers=(0,))
            self.max_txt_len = 16
        else:
            d = self._config_json("transformer")
            self.dit_config = ErnieConfig(
                hidden_size=d.get("hidden_size", 3072),
                num_attention_heads=d.get("num_attention_heads", 24),
                num_layers=d.get("num_layers", 24),
                ffn_hidden_size=d.get("ffn_hidden_size", 8192),
                in_channels=d.get("in_channels", 128),
                out_channels=d.get("out_channels", 128),
                patch_size=d.get("patch_size", 1),
                text_in_dim=d.get("text_in_dim", 2560),
                rope_theta=float(d.get("rope_theta", 256)),
                rope_axes_dim=tuple(d.get("rope_axes_dim") or (32, 48, 48)),
                eps=float(d.get("eps", 1e-6)),
                qk_layernorm=bool(d.get("qk_layernorm", True)),
            )
            self.vae_config = VAEConfig(
                latent_channels=self.dit_config.in_channels // 4,
                scaling_factor=1.0, use_quant_conv=False,
            )
            te = self._config_json("text_encoder")
            base = LLMConfig.ernie45()
            n_layers = te.get("num_hidden_layers", base.n_layers)
            self.llm_config = LLMConfig(
                vocab_size=te.get("vocab_size", base.vocab_size),
                d_model=te.get("hidden_size", base.d_model),
                n_layers=n_layers,
                n_heads=te.get("num_attention_heads", base.n_heads),
                n_kv_heads=te.get("num_key_value_heads", base.n_kv_heads),
                head_dim=te.get("head_dim", base.head_dim),
                d_ff=te.get("intermediate_size", base.d_ff),
                rope_theta=float(te.get("rope_theta", base.rope_theta)),
                rms_eps=float(te.get("rms_norm_eps", base.rms_eps)),
                all_bias=bool(te.get("use_bias", False)),
                rope_interleaved=True,
                # hidden_states[-2] == output of layer n-2 (HF tuple layout)
                collect_layers=(n_layers - 2,),
            )
        self.dit = ErnieDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def _config_json(self, sub: str) -> dict:
        import json
        import os

        p = os.path.join(self.config.name_or_path or "", sub, "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return dict(self.config.model_kwargs.get(f"{sub}_config", {}))

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, 4, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.text_in_dim)), jnp.zeros((1,)),
            jnp.ones((1, 8), bool),
        )
        # reference zero-inits the shared modulation + final projection
        dparams = dit_vars["params"]
        for name in ("adaLN_modulation", "final_linear"):
            dparams[name] = jax.tree.map(jnp.zeros_like, dparams[name])
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, 16, 16, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {
            "dit": dit_vars["params"], "vae": vae_vars["params"],
            "te": te_vars["params"],
            "latent_bn": {
                "mean": jnp.zeros((cfg.in_channels,), jnp.float32),
                "std": jnp.ones((cfg.in_channels,), jnp.float32),
            },
        }

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and os.path.isdir(os.path.join(path, "transformer")):
            from ai_toolkit_tpu.io.dit_importers import load_ernie_checkpoint

            return load_ernie_checkpoint(path, self)
        if path:
            raise FileNotFoundError(
                f"arch 'ernie_image': no transformer/ checkpoint found under "
                f"'{path}' — refusing to random-init a named model. Use "
                f'name_or_path: "" for architecture experiments from scratch.'
            )
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        out = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        txt = out["collected"][0] if isinstance(out, dict) else out
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def predict(self, variables, noisy_latents, t, cond):
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        # reference passes scheduler timesteps on the 0..1000 scale
        return self.dit.apply(
            colls, noisy_latents, cond["txt"], t * 1000.0, cond.get("txt_mask")
        )

    # ---- latent space: 2x2-patchified, BatchNorm-standardized ----

    def _bn(self, variables):
        bn = variables.get("latent_bn")
        if bn is None:
            c = self.dit_config.in_channels
            return jnp.zeros((c,)), jnp.ones((c,))
        return bn["mean"], bn["std"]

    def encode_images(self, variables, images, rng=None):
        lat = self.vae.apply({"params": variables["vae"]}, images, rng,
                             method=AutoencoderKL.encode)
        b, h, w, c = lat.shape
        lat = lat.reshape(b, h // 2, 2, w // 2, 2, c)
        lat = lat.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c)
        mean, std = self._bn(variables)
        return (lat - mean) / std

    def decode_latents(self, variables, latents):
        mean, std = self._bn(variables)
        lat = latents * std + mean
        b, h, w, c4 = lat.shape
        c = c4 // 4
        lat = lat.reshape(b, h, w, c, 2, 2)
        lat = lat.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c)
        return self.vae.apply({"params": variables["vae"]}, lat,
                              method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = 2 * self.vae_config.downscale
        return height // d, width // d, self.dit_config.in_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        p = self.dit_config.patch_size
        return (h // p) * (w // p)

    def lora_targets(self):
        return ernie_lora_targets()

    def partition_rules(self):
        return ernie_partition_rules()
