"""Ideogram 4 DiT — exact reimplementation + model wrapper.

Parity target: the vendored reference sources
``extensions_built_in/diffusion_models/ideogram4/src/transformer.py``
(packed single-stream [text | image] sequence; per-token role indicator
embedding; Qwen3-VL multi-layer features RMS-normed and projected into the
text slots; interleaved MRoPE with image positions offset by 65536; blocks
with fused-qkv attention + per-head q/k RMSNorms (eps 1e-5), sandwich output
norms, tanh-gated 4-way adaLN from a 512-dim timestep projection, SwiGLU MLP;
scale-only modulated final layer) and ``src/pipeline.py`` / ``ideogram4.py``
(flux-VAE 32ch latents patchified 2x2 into 128-ch tokens with per-channel
shift/scale normalization, t-convention flip (model: 1=clean) with negated
velocity, resolution-aware logit-normal inference sigmas, image-only
asymmetric CFG).

TPU-first notes: the packed sequence keeps STATIC shapes — text is padded to
``max_txt_len`` with the pad tokens masked out of every consumed attention
row (pad-query rows are never read, so a key-side mask is exactly equivalent
to the reference's block-diagonal segment mask); MRoPE tables are built
in-graph from the mask cumsum (cheap), blocks run under ``nn.scan`` + remat.
"""

from __future__ import annotations

import json
import math
import os
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
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

IMAGE_POSITION_OFFSET = 65536
# Qwen3-VL layers whose hidden states condition the transformer
QWEN3_VL_ACTIVATION_LAYERS = (0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33, 35)


@dataclass(frozen=True)
class Ideogram4Config:
    emb_dim: int = 4608
    num_layers: int = 34
    num_heads: int = 18
    intermediate_size: int = 12288
    adanln_dim: int = 512
    in_channels: int = 128  # ae_channels(32) * patch(2)^2
    llm_features_dim: int = 4096 * len(QWEN3_VL_ACTIVATION_LAYERS)
    rope_theta: float = 5_000_000.0
    mrope_section: tuple[int, ...] = (24, 20, 20)
    norm_eps: float = 1e-5
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.emb_dim // self.num_heads

    @classmethod
    def tiny(cls) -> "Ideogram4Config":
        return cls(emb_dim=32, num_layers=2, num_heads=2, intermediate_size=64,
                   adanln_dim=16, in_channels=16, llm_features_dim=48,
                   mrope_section=(4, 2, 2), remat=False, dtype=jnp.float32)


def _rms(x, weight, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _sinusoidal(t: jax.Array, dim: int, scale: float = 1e4) -> jax.Array:
    """Reference _sinusoidal_embedding: freq = exp(-log(scale)*i/(half-1)),
    [sin | cos] halves."""
    half = dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(scale) / (half - 1))
    )
    emb = t.astype(jnp.float32)[..., None] * freq
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def mrope_axis_selector(head_dim: int, mrope_section: tuple[int, ...]) -> np.ndarray:
    """Per-frequency position-axis index for interleaved MRoPE: axis 1 (h)
    claims freq idx 1,4,7,... up to section[1]*3; axis 2 (w) claims 2,5,8,...;
    the rest stay temporal (axis 0)."""
    sel = np.zeros(head_dim // 2, dtype=np.int32)
    for axis in (1, 2):
        idx = np.arange(axis, mrope_section[axis] * 3, 3)
        sel[idx] = axis
    return sel


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class Ideogram4Block(nn.Module):
    cfg: Ideogram4Config

    @nn.compact
    def __call__(self, x, adaln, cos, sin, key_mask):
        cfg = self.cfg
        d, nh, hd = cfg.emb_dim, cfg.num_heads, cfg.head_dim
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n, _ = x.shape
        eps = cfg.norm_eps

        mod = Linear(4 * d, dtype=dt, param_dtype=pdt, name="adaln")(adaln)
        sc_a, g_a, sc_m, g_m = jnp.split(mod, 4, axis=-1)
        g_a, g_m = jnp.tanh(g_a), jnp.tanh(g_m)
        sc_a, sc_m = 1.0 + sc_a, 1.0 + sc_m

        w_an1 = self.param("attn_norm1", nn.initializers.ones_init(), (d,), pdt)
        h = _rms(x, w_an1, eps) * sc_a
        qkv = Linear(3 * d, use_bias=False, dtype=dt, param_dtype=pdt, name="qkv")(h)
        q, k, v = (y.reshape(b, n, nh, hd) for y in jnp.split(qkv, 3, axis=-1))
        # per-head q/k norms built with eps=1e-5 (Ideogram4Attention.__init__)
        q = _rms(q, self.param("q_norm", nn.initializers.ones_init(), (hd,), pdt), 1e-5)
        k = _rms(k, self.param("k_norm", nn.initializers.ones_init(), (hd,), pdt), 1e-5)

        def rope(y):
            y32 = y.astype(jnp.float32)
            # cos/sin: [B, L, head_dim] broadcast over heads
            out = y32 * cos[:, :, None] + _rotate_half(y32) * sin[:, :, None]
            return out.astype(y.dtype)

        q, k = rope(q), rope(k)
        attn = dot_product_attention(q, k, v, mask=key_mask).reshape(b, n, nh * hd)
        attn = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="o")(attn)
        w_an2 = self.param("attn_norm2", nn.initializers.ones_init(), (d,), pdt)
        x = x + g_a * _rms(attn, w_an2, eps)

        w_fn1 = self.param("ffn_norm1", nn.initializers.ones_init(), (d,), pdt)
        h = _rms(x, w_fn1, eps) * sc_m
        w1 = Linear(cfg.intermediate_size, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="w1")(h)
        w3 = Linear(cfg.intermediate_size, use_bias=False, dtype=dt, param_dtype=pdt,
                    name="w3")(h)
        mlp = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="w2")(
            nn.silu(w1) * w3
        )
        w_fn2 = self.param("ffn_norm2", nn.initializers.ones_init(), (d,), pdt)
        return x + g_m * _rms(mlp, w_fn2, eps)


class _IdeoCarry(nn.Module):
    cfg: Ideogram4Config

    @nn.compact
    def __call__(self, x, adaln, cos, sin, key_mask):
        return Ideogram4Block(self.cfg, name="block")(x, adaln, cos, sin, key_mask), None


class Ideogram4DiT(nn.Module):
    """Packed [text | image] single stream. Inputs use the MODEL's own time
    convention (t=1 is clean) and predict ``clean - noise``; the wrapper's
    ``predict`` flips both to the toolkit convention."""

    cfg: Ideogram4Config

    @nn.compact
    def __call__(self, img_tokens, gh, gw, llm_feats, t, txt_mask):
        """img_tokens: [B, gh*gw, in_channels] row-major; llm_feats:
        [B, Lt, llm_dim]; t: [B] in the MODEL convention (1 = clean);
        txt_mask: [B, Lt] (1 = real token). Returns the image-token output."""
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d = cfg.emb_dim
        b, li, _ = img_tokens.shape
        lt = llm_feats.shape[1]
        n = lt + li
        mask_f = txt_mask.astype(dt)[..., None]

        x_img = Linear(d, dtype=dt, param_dtype=pdt, name="input_proj")(
            img_tokens.astype(dt)
        )
        w_cn = self.param("llm_cond_norm", nn.initializers.ones_init(),
                          (cfg.llm_features_dim,), pdt)
        feats = _rms(llm_feats.astype(dt) * mask_f, w_cn, 1e-6)
        feats = Linear(d, dtype=dt, param_dtype=pdt, name="llm_cond_proj")(feats) * mask_f

        h = jnp.concatenate([feats, x_img], axis=1)

        ind_emb = self.param("image_indicator", nn.initializers.normal(1.0), (2, d), pdt)
        ind = jnp.concatenate(
            [jnp.tile(ind_emb[0].astype(dt), (b, lt, 1)),
             jnp.tile(ind_emb[1].astype(dt), (b, li, 1))], axis=1,
        )
        h = h + ind

        # t embedding: EmbedScalar over (0,1) -> adaln projection (+silu twice,
        # once here and once inside the final layer, exactly as the reference)
        t_emb = _sinusoidal(1e4 * jnp.clip(t, 0.0, 1.0), d).astype(dt)
        t_emb = Linear(d, dtype=dt, param_dtype=pdt, name="t_mlp_in")(t_emb)
        t_cond = Linear(d, dtype=dt, param_dtype=pdt, name="t_mlp_out")(nn.silu(t_emb))
        adaln = nn.silu(
            Linear(cfg.adanln_dim, dtype=dt, param_dtype=pdt, name="adaln_proj")(t_cond)
        )[:, None]  # [B, 1, adanln_dim]

        # MRoPE: text positions = mask cumsum (all 3 axes equal); image
        # positions = OFFSET + (0, row, col). Interleaved axis selection.
        text_pos = jnp.clip(jnp.cumsum(txt_mask.astype(jnp.int32), axis=-1) - 1, 0)
        pos_txt = jnp.repeat(text_pos[..., None], 3, axis=-1)  # [B, Lt, 3]
        rr, cc = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        img_pos = np.stack(
            [np.zeros(gh * gw, np.int32), rr.reshape(-1), cc.reshape(-1)], axis=-1
        ) + IMAGE_POSITION_OFFSET
        pos = jnp.concatenate(
            [pos_txt, jnp.broadcast_to(jnp.asarray(img_pos)[None], (b, li, 3))], axis=1
        )  # [B, N, 3]
        sel = jnp.asarray(mrope_axis_selector(cfg.head_dim, cfg.mrope_section))
        inv_freq = 1.0 / (
            cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim)
        )
        pos_sel = jnp.take_along_axis(
            pos, jnp.broadcast_to(sel[None, None], (b, n, sel.shape[0])), axis=-1
        ).astype(jnp.float32)  # [B, N, head_dim/2]
        freqs = pos_sel * jnp.asarray(inv_freq, jnp.float32)[None, None]
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos, sin = jnp.cos(emb), jnp.sin(emb)

        # key-side mask: pad text keys are invisible to every consumed row
        joint = jnp.concatenate([txt_mask.astype(bool), jnp.ones((b, li), bool)], axis=1)
        key_mask = jnp.broadcast_to(joint[:, None, None, :], (b, 1, n, n))

        if cfg.scan_blocks:
            Carry = nn.remat(_IdeoCarry, prevent_cse=False) if cfg.remat else _IdeoCarry
            h, _ = nn.scan(
                Carry,
                length=cfg.num_layers,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="layers")(h, adaln, cos, sin, key_mask)
        else:
            for i in range(cfg.num_layers):
                h = Ideogram4Block(cfg, name=f"layer_{i}")(h, adaln, cos, sin, key_mask)

        scale = 1.0 + Linear(d, dtype=dt, param_dtype=pdt, name="final_adaln")(
            nn.silu(adaln)
        )
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean((h32 - mu) ** 2, axis=-1, keepdims=True)
        h = (((h32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt)) * scale
        out = Linear(cfg.in_channels, dtype=dt, param_dtype=pdt, name="final_linear")(h)
        return out[:, lt:].astype(jnp.float32)  # image tokens only


def _latent_norm() -> tuple[np.ndarray, np.ndarray]:
    p = os.path.join(os.path.dirname(__file__), "ideogram_latent_norm.json")
    with open(p) as f:
        d = json.load(f)
    return np.asarray(d["shift"], np.float32), np.asarray(d["scale"], np.float32)


def ideogram_inference_sigmas(
    num_steps: int, height: int, width: int, mu: float = 0.0, std: float = 1.75
) -> np.ndarray:
    """Resolution-aware logit-normal sigma schedule
    (src/pipeline.py get_ideogram4_sigmas)."""
    from scipy.stats import norm as _norm  # ndtri

    logsnr_min, logsnr_max = -15.0, 18.0
    mean = mu + 0.5 * math.log((width * height) / (512 * 512))
    u = np.linspace(0.0, 1.0, num_steps + 1)
    # expit(mean + std * ndtri(u)); clamp endpoints where ndtri is inf
    z = _norm.ppf(np.clip(u, 1e-12, 1 - 1e-12))
    t = 1.0 - 1.0 / (1.0 + np.exp(-(mean + std * z)))
    t_min = 1.0 / (1.0 + math.exp(0.5 * logsnr_max))
    t_max = 1.0 / (1.0 + math.exp(0.5 * logsnr_min))
    sigmas = (1.0 - np.clip(t, t_min, t_max))[::-1].copy()
    sigmas[-1] = 0.0
    return sigmas.astype(np.float32)


def ideogram_lora_targets() -> list[str]:
    return [r"(qkv|o|w1|w2|w3)$"]


def ideogram_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(qkv|w1|w3)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(o|w2)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


@register_model
class Ideogram4Model(BaseTpuModel):
    """ideogram4: flux-VAE 32ch latents patchified 2x2 -> 128-ch tokens with
    per-channel shift/scale normalization; Qwen3-VL multi-layer interleaved
    features; model time convention flipped (+output negated) in predict."""

    arch = "ideogram4"
    archs = ["ideogram4"]
    is_flow_matching = True
    bucket_divisibility = 16  # vae 8x * patch 2
    max_txt_len = 512
    # asymmetric CFG: unconditional pass is image-only with zeroed text
    # (src/pipeline.py:350-357)
    cfg_uncond = "zero_text"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        if config.model_kwargs.get("size") == "tiny":
            self.dit_config = Ideogram4Config.tiny()
            self.vae_config = VAEConfig(
                latent_channels=4, base_channels=16, channel_multipliers=(1, 2),
                layers_per_block=1, scaling_factor=1.0, use_quant_conv=False,
                dtype=jnp.float32,
            )
            # llm_features_dim = hidden(8) * taps(6): tiny 8-layer tower
            self.llm_config = LLMConfig.tiny(
                d_model=8, n_layers=8, n_heads=2, n_kv_heads=2, head_dim=4, d_ff=16,
                qk_head_norm=True, collect_layers=(0, 2, 4, 5, 6, 7),
            )
            self.max_txt_len = 16
            self._shift = np.zeros(16, np.float32)
            self._scale = np.ones(16, np.float32)
        else:
            d = self._config_json("transformer")
            self.dit_config = Ideogram4Config(
                emb_dim=d.get("emb_dim", 4608),
                num_layers=d.get("num_layers", 34),
                num_heads=d.get("num_heads", 18),
                intermediate_size=d.get("intermediate_size", 12288),
                adanln_dim=d.get("adanln_dim", 512),
                in_channels=d.get("in_channels", 128),
                rope_theta=float(d.get("rope_theta", 5_000_000.0)),
                mrope_section=tuple(d.get("mrope_section") or (24, 20, 20)),
                norm_eps=float(d.get("norm_eps", 1e-5)),
            )
            self.vae_config = VAEConfig(
                latent_channels=32, scaling_factor=1.0, use_quant_conv=False
            )
            te = self._config_json("text_encoder")
            self.llm_config = LLMConfig(
                vocab_size=te.get("vocab_size", 151_936),
                d_model=te.get("hidden_size", 4096),
                n_layers=te.get("num_hidden_layers", 36),
                n_heads=te.get("num_attention_heads", 32),
                n_kv_heads=te.get("num_key_value_heads", 8),
                head_dim=te.get("head_dim", 128),
                d_ff=te.get("intermediate_size", 12288),
                rope_theta=float(te.get("rope_theta", 5_000_000.0)),
                rms_eps=float(te.get("rms_norm_eps", 1e-6)),
                qk_head_norm=True,
                collect_layers=QWEN3_VL_ACTIVATION_LAYERS,
            )
            self._shift, self._scale = _latent_norm()
        self.dit = Ideogram4DiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def _config_json(self, sub: str) -> dict:
        p = os.path.join(self.config.name_or_path or "", sub, "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                d = json.load(f)
            return d.get("text_config", d) if sub == "text_encoder" else d
        return dict(self.config.model_kwargs.get(f"{sub}_config", {}))

    # ---- variables ----

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 4, cfg.in_channels)), 2, 2,
            jnp.zeros((1, 8, cfg.llm_features_dim)), jnp.zeros((1,)),
            jnp.ones((1, 8), jnp.int32),
        )
        d = self.vae_config.downscale
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, 2 * d, 2 * d, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"],
                "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_ideogram_checkpoint

            return load_ideogram_checkpoint(path, self)
        if path:
            # loud failure beats silently training against random weights
            raise FileNotFoundError(
                f"arch '{self.config.arch}': no transformer/ checkpoint found "
                f"under '{path}' — refusing to random-init a named model. Use "
                f'name_or_path: "" for architecture experiments from scratch.'
            )
        return self.init_variables(rng)

    # ---- conditioning ----

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        from ai_toolkit_tpu.utils.ideogram_caption import digest_caption_string

        # structured-JSON captions are normalized/migrated to the compact
        # model-ready string (reference ideogram4.py:522); plain text passes
        prompts = [digest_caption_string(p) for p in prompts]
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        out = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        # interleave the tapped layers per hidden unit: (taps, B, L, H) ->
        # (B, L, H, taps) -> (B, L, H*taps), matching get_qwen3_vl_features
        col = out["collected"]
        feats = jnp.transpose(col, (1, 2, 3, 0)).reshape(
            col.shape[1], col.shape[2], -1
        )
        feats = feats * jnp.asarray(mask, feats.dtype)[..., None]
        return {"txt": feats, "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        return jnp.zeros((1,))  # MRoPE is built in-graph from the mask

    def inference_sigmas(self, num_steps: int, height: int, width: int) -> np.ndarray:
        mu = float(self.config.model_kwargs.get("ideogram_schedule_mu", 0.0))
        std = float(self.config.model_kwargs.get("ideogram_schedule_std", 1.75))
        return ideogram_inference_sigmas(num_steps, height, width, mu, std)

    def predict(self, variables, noisy_latents, t, cond):
        b, gh, gw, c = noisy_latents.shape
        img = noisy_latents.reshape(b, gh * gw, c)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        # toolkit t (1 = noise) -> model t (1 = clean); model predicts
        # clean - noise -> negate for the toolkit velocity target
        out = self.dit.apply(
            colls, img, gh, gw, cond["txt"], 1.0 - t, cond["txt_mask"]
        )
        return (-out).reshape(b, gh, gw, c)

    # ---- latents: VAE mean -> 2x2 patchify (ph, pw, ae order) -> norm ----

    def encode_images(self, variables, images, rng=None):
        z = self.vae.apply({"params": variables["vae"]}, images, None,
                           method=AutoencoderKL.encode)
        b, h8, w8, ae = z.shape
        z = z.reshape(b, h8 // 2, 2, w8 // 2, 2, ae)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h8 // 2, w8 // 2, 4 * ae)
        shift = jnp.asarray(self._shift, z.dtype)
        scale = jnp.asarray(self._scale, z.dtype)
        return (z - shift) / scale

    def decode_latents(self, variables, latents):
        b, gh, gw, c = latents.shape
        ae = c // 4
        z = latents * jnp.asarray(self._scale, latents.dtype) + jnp.asarray(
            self._shift, latents.dtype
        )
        z = z.reshape(b, gh, gw, 2, 2, ae)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * 2, gw * 2, ae)
        return self.vae.apply({"params": variables["vae"]}, z,
                              method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale * 2
        return height // d, width // d, 4 * self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return h * w

    def lora_targets(self):
        return ideogram_lora_targets()

    def partition_rules(self):
        return ideogram_partition_rules()
