"""F-Lite (Freepik/fal) DiT — exact reimplementation + model wrapper.

Parity target: the vendored reference sources
``extensions_built_in/diffusion_models/f_light/src/model.py`` (DiT: conv
patch embed, 16 learned register tokens prepended, 2D rotary over h|w halves
with identity rotation on the registers, per-block [RMSNorm -> self-attn with
post-rope paramless QK-norm and optional residual-v mixing -> RMSNorm ->
cross-attn from T5 states -> RMSNorm -> GELU MLP] all modulated by a 9-way
adaLN from the timestep embedding, and a 2-way modulated final head) and
``f_light.py`` (flux 16-ch VAE + T5 conditioning, flow matching). Dims load
from the checkpoint's ``transformer/config.json`` (the reference uses
``DiT.from_pretrained`` the same way).
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
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

N_REGISTERS = 16


@dataclass(frozen=True)
class FLiteConfig:
    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 3072
    depth: int = 40
    num_heads: int = 24
    mlp_ratio: float = 4.0
    cross_attn_input_size: int = 4096
    residual_v: bool = False
    rope_base: float = 10000.0
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls) -> "FLiteConfig":
        return cls(in_channels=4, hidden_size=32, depth=2, num_heads=2,
                   cross_attn_input_size=64, residual_v=True, remat=False,
                   dtype=jnp.float32)


def _rms(x, weight=None, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight
    return y.astype(x.dtype)


def _rot(x, cos, sin):
    """f-lite rotary: half-split, y1 = x1 c + x2 s; y2 = -x1 s + x2 c."""
    x32 = x.astype(jnp.float32)
    d = x32.shape[-1] // 2
    x1, x2 = x32[..., :d], x32[..., d:]
    return jnp.concatenate([x1 * cos + x2 * sin, -x1 * sin + x2 * cos], -1).astype(x.dtype)


def flite_rope_table(h: int, w: int, head_dim: int, base: float = 10000.0) -> np.ndarray:
    """[2, 1, 16+h*w, head_dim/2] stacked (cos, sin); identity rotation
    (cos=1, sin=0) on the register positions."""
    dim = head_dim // 2
    inv = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    fh = np.repeat((np.arange(h)[:, None] * inv)[:, None, :], w, axis=1)
    fw = np.repeat((np.arange(w)[:, None] * inv)[None, :, :], h, axis=0)
    f = np.concatenate([fh, fw], axis=-1).reshape(h * w, dim)
    cos = np.concatenate([np.ones((N_REGISTERS, dim)), np.cos(f)], 0)
    sin = np.concatenate([np.zeros((N_REGISTERS, dim)), np.sin(f)], 0)
    return np.stack([cos, sin]).astype(np.float32)[:, None]


class FLiteBlock(nn.Module):
    cfg: FLiteConfig

    @nn.compact
    def __call__(self, x, context, temb, v0, seen, cos, sin):
        cfg = self.cfg
        d, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n, _ = x.shape

        mod = Linear(9 * d, dtype=dt, param_dtype=pdt, name="mod")(nn.silu(temb))
        (sh_sa, sc_sa, g_sa, sh_ca, sc_ca, g_ca, sh_mlp, sc_mlp, g_mlp) = [
            m[:, None] for m in jnp.split(mod, 9, axis=-1)
        ]

        def heads(y):
            return y.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        def unheads(y):
            return y.transpose(0, 2, 1, 3).reshape(b, -1, nh * hd)

        # self-attention (QK-norm applied AFTER rope, as the reference does)
        w1 = self.param("norm1_scale", nn.initializers.ones_init(), (d,), pdt)
        h = _rms(x, w1) * (1 + sc_sa) + sh_sa
        qkv = Linear(3 * d, dtype=dt, param_dtype=pdt, name="self_qkv")(h)
        q, k, v = (heads(y) for y in jnp.split(qkv, 3, axis=-1))
        if cfg.residual_v:
            lam = self.param("lambda_param", nn.initializers.constant(0.5), (1,), pdt)
            v_mixed = lam * v + (1 - lam) * v0
            v = jnp.where(seen > 0, v_mixed, v)
        v_out = v
        q, k = _rot(q, cos, sin), _rot(k, cos, sin)
        q, k = _rms(q), _rms(k)
        attn = jax.nn.softmax(
            (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2))
            * hd ** -0.5, axis=-1,
        )
        o = unheads((attn @ v.astype(jnp.float32)).astype(dt))
        o = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="self_proj")(o)
        x = x + o * g_sa

        # cross-attention from the text states
        w2 = self.param("norm2_scale", nn.initializers.ones_init(), (d,), pdt)
        h = _rms(x, w2) * (1 + sc_ca) + sh_ca
        q = heads(Linear(d, dtype=dt, param_dtype=pdt, name="cross_q")(h))
        kv = Linear(2 * d, dtype=dt, param_dtype=pdt, name="cross_kv")(context.astype(dt))
        k, v = (heads(y) for y in jnp.split(kv, 2, axis=-1))
        q, k = _rms(q), _rms(k)
        attn = jax.nn.softmax(
            (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2))
            * hd ** -0.5, axis=-1,
        )
        o = unheads((attn @ v.astype(jnp.float32)).astype(dt))
        o = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="cross_proj")(o)
        x = x + o * g_ca

        # MLP
        w3 = self.param("norm3_scale", nn.initializers.ones_init(), (d,), pdt)
        h = _rms(x, w3) * (1 + sc_mlp) + sh_mlp
        h = Linear(int(d * cfg.mlp_ratio), dtype=dt, param_dtype=pdt, name="mlp_in")(h)
        h = Linear(d, dtype=dt, param_dtype=pdt, name="mlp_out")(nn.gelu(h, approximate=False))
        return x + h * g_mlp, v_out


class _FLiteCarry(nn.Module):
    cfg: FLiteConfig

    @nn.compact
    def __call__(self, carry, context, temb, cos, sin):
        x, v0, seen = carry
        x, v = FLiteBlock(self.cfg, name="block")(x, context, temb, v0, seen, cos, sin)
        v0 = jnp.where(seen > 0, v0, v)
        return (x, v0, jnp.ones_like(seen)), None


def _timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class FLiteDiT(nn.Module):
    cfg: FLiteConfig

    @nn.compact
    def __call__(self, x, context, t, pe):
        """x: [B, H, W, C] latents; context: [B, S, ctx]; t in [0,1];
        pe: [2, 1, 16+N, head_dim/2] from flite_rope_table."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d, p = cfg.hidden_size, cfg.patch_size
        b, hh, ww, c = x.shape

        kernel = self.param("patch_proj_kernel", nn.initializers.lecun_normal(),
                            (p, p, c, d), pdt)
        bias = self.param("patch_proj_bias", nn.initializers.zeros_init(), (d,), pdt)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        tokens = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (p, p), "VALID", dimension_numbers=dn
        ) + bias.astype(dt)
        tokens = tokens.reshape(b, -1, d)

        regs = self.param("register_tokens", nn.initializers.normal(1.0),
                          (1, N_REGISTERS, d), pdt)
        tokens = jnp.concatenate([jnp.tile(regs.astype(dt), (b, 1, 1)), tokens], axis=1)

        temb = _timestep_embedding(t * 1000.0, d).astype(dt)
        temb = Linear(4 * d, dtype=dt, param_dtype=pdt, name="time_embed_in")(temb)
        temb = Linear(d, dtype=dt, param_dtype=pdt, name="time_embed_out")(nn.silu(temb))

        cos, sin = pe[0].astype(jnp.float32), pe[1].astype(jnp.float32)
        if cfg.scan_blocks:
            Carry = nn.remat(_FLiteCarry, prevent_cse=False) if cfg.remat else _FLiteCarry
            v0 = jnp.zeros((b, cfg.num_heads, tokens.shape[1], cfg.head_dim), dt)
            (tokens, _, _), _ = nn.scan(
                Carry,
                length=cfg.depth,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0, "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")((tokens, v0, jnp.zeros((), dt)), context, temb, cos, sin)
        else:
            v0 = None
            for i in range(cfg.depth):
                seen = jnp.ones((), dt) if i > 0 else jnp.zeros((), dt)
                vin = v0 if v0 is not None else jnp.zeros(
                    (b, cfg.num_heads, tokens.shape[1], cfg.head_dim), dt
                )
                tokens, v = FLiteBlock(cfg, name=f"block_{i}")(
                    tokens, context, temb, vin, seen, cos, sin
                )
                if v0 is None:
                    v0 = v

        tokens = tokens[:, N_REGISTERS:]
        fmod = Linear(2 * d, dtype=dt, param_dtype=pdt, name="final_mod")(nn.silu(temb))
        f_shift, f_scale = jnp.split(fmod, 2, axis=-1)
        wf = self.param("final_norm_scale", nn.initializers.ones_init(), (d,), pdt)
        tokens = _rms(tokens, wf) * (1 + f_scale[:, None]) + f_shift[:, None]
        out = Linear(p * p * c, dtype=dt, param_dtype=pdt, name="final_proj")(tokens)
        # b (h w) (p1 p2 c) -> b (h p1) (w p2) c
        out = out.reshape(b, hh // p, ww // p, p, p, c)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)


def flite_lora_targets() -> list[str]:
    return [r"(self_qkv|self_proj|cross_q|cross_kv|cross_proj|mlp_in|mlp_out)$"]


def flite_partition_rules(scan_blocks: bool = True):
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(self_qkv|cross_kv|mlp_in|mod)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(self_proj|cross_proj|mlp_out)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


@register_model
class FLiteModel(BaseTpuModel):
    arch = "f-lite"
    archs = ["f-lite", "f_lite", "flite"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.dit_config = FLiteConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        else:
            d = self._config_json()
            self.dit_config = FLiteConfig(
                in_channels=d.get("in_channels", 16),
                patch_size=d.get("patch_size", 2),
                hidden_size=d.get("hidden_size", 3072),
                depth=d.get("depth", 40),
                num_heads=d.get("num_heads", 24),
                mlp_ratio=d.get("mlp_ratio", 4.0),
                cross_attn_input_size=d.get("cross_attn_input_size", 4096),
                residual_v=d.get("residual_v", False),
                rope_base=d.get("rope_base", 10000.0),
            )
            self.vae_config = VAEConfig.flux()
            self.t5_config = T5Config.xxl()
        self.dit = FLiteDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def _config_json(self) -> dict:
        import json
        import os

        p = os.path.join(self.config.name_or_path or "", "transformer", "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return dict(self.config.model_kwargs.get("transformer_config", {}))

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        p = cfg.patch_size
        pe = jnp.asarray(flite_rope_table(2, 2, cfg.head_dim, cfg.rope_base))
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 2 * p, 2 * p, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.cross_attn_input_size)), jnp.zeros((1,)), pe,
        )
        d = self.vae_config.downscale
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, 2 * d, 2 * d, 3)))
        t5_vars = self.t5.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "t5": t5_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_flite_checkpoint

            return load_flite_checkpoint(path, self)
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
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        p = self.dit_config.patch_size
        return jnp.asarray(flite_rope_table(
            latent_h // p, latent_w // p, self.dit_config.head_dim,
            self.dit_config.rope_base,
        ))

    def predict(self, variables, noisy_latents, t, cond):
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        return self.dit.apply(colls, noisy_latents, cond["txt"], t, cond["pe"])

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
        return flite_lora_targets()

    def partition_rules(self):
        return flite_partition_rules(self.dit_config.scan_blocks)
