"""PRX (Photoroom) DiT — exact reimplementation + pixel-space model wrapper.

Parity target: the vendored reference sources
``extensions_built_in/diffusion_models/prx_pixel_t2i/src/transformer_prx.py``
(PRXTransformer2DModel: patchified image tokens through an optional two-layer
bottleneck projection, text tokens projected once, N identical blocks where
only the IMAGE stream carries queries and the KV set is [txt, img] with
per-head RMSNorms on q/k/txt-k and BFL-style 2D rope on the image q/k,
6-way zero-init modulation from the timestep(+resolution) vector, gated
GELU-tanh MLP, and a 2-way modulated final projection back to patches) and
``prx_pixel_t2i.py`` (pixel-space variant: in_channels=3, patch 16, identity
VAE, x-prediction with noise_scale 2.0, Qwen3-VL text tower, flow shift 3.0).

TPU-first notes: tokens stay [B, L, D] with static shapes; the rope table is
precomputed host-side per resolution bucket; blocks run under ``nn.scan``
(params stacked [L, ...]) with remat; attention uses the shared dispatch
(pallas flash when unmasked, XLA fused otherwise).
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
from ai_toolkit_tpu.ops.rope import apply_rope, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@dataclass(frozen=True)
class PRXConfig:
    # diffusers-config fields (transformer/config.json keys match)
    in_channels: int = 3
    patch_size: int = 16
    context_in_dim: int = 2048
    hidden_size: int = 1792
    mlp_ratio: float = 3.5
    num_heads: int = 28
    depth: int = 16
    axes_dim: tuple[int, ...] = (32, 32)
    theta: float = 10_000.0
    time_factor: float = 1000.0
    time_max_period: float = 10_000.0
    bottleneck_size: int | None = 1024
    resolution_embeds: bool = True
    scan_blocks: bool = True
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size**2

    @classmethod
    def tiny(cls) -> "PRXConfig":
        return cls(in_channels=3, patch_size=4, hidden_size=32, num_heads=2,
                   depth=2, context_in_dim=64, axes_dim=(8, 8),
                   bottleneck_size=24, remat=False, dtype=jnp.float32)


def _rms_head(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-head RMSNorm over the last (head_dim) axis, f32 accumulate."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Paramless LayerNorm (elementwise_affine=False), f32 accumulate."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _sin_embedding(t: jax.Array, dim: int, max_period: float, scale: float) -> jax.Array:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 -> [cos | sin] halves."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _MLPEmbedder(nn.Module):
    """in -> silu -> out (reference MLPEmbedder, both layers biased)."""

    hidden: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="in_layer")(x)
        return Linear(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="out_layer")(nn.silu(h))


class PRXBlock(nn.Module):
    cfg: PRXConfig

    @nn.compact
    def __call__(self, x, txt, vec, pe, txt_mask):
        cfg = self.cfg
        d, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, n_img, _ = x.shape
        n_txt = txt.shape[1]

        mod = Linear(6 * d, dtype=dt, param_dtype=pdt, name="mod")(nn.silu(vec))
        (sh_a, sc_a, g_a, sh_m, sc_m, g_m) = [
            m[:, None] for m in jnp.split(mod, 6, axis=-1)
        ]

        h = (1 + sc_a) * _layer_norm(x) + sh_a
        qkv = Linear(3 * d, use_bias=False, dtype=dt, param_dtype=pdt, name="img_qkv")(h)
        q, k, v = (y.reshape(b, n_img, nh, hd) for y in jnp.split(qkv, 3, axis=-1))
        q = _rms_head(q, self.param("q_norm", nn.initializers.ones_init(), (hd,), pdt))
        k = _rms_head(k, self.param("k_norm", nn.initializers.ones_init(), (hd,), pdt))

        kv = Linear(2 * d, use_bias=False, dtype=dt, param_dtype=pdt, name="txt_kv")(txt)
        tk, tv = (y.reshape(b, n_txt, nh, hd) for y in jnp.split(kv, 2, axis=-1))
        tk = _rms_head(
            tk, self.param("added_k_norm", nn.initializers.ones_init(), (hd,), pdt)
        )

        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        k = jnp.concatenate([tk, k], axis=1)
        v = jnp.concatenate([tv, v], axis=1)

        mask = None
        if txt_mask is not None:
            joint = jnp.concatenate(
                [txt_mask.astype(bool), jnp.ones((b, n_img), bool)], axis=1
            )
            mask = jnp.broadcast_to(joint[:, None, None, :], (b, 1, n_img, n_txt + n_img))
        attn = dot_product_attention(q, k, v, mask=mask).reshape(b, n_img, nh * hd)
        attn = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="attn_out")(attn)
        x = x + g_a * attn

        h = (1 + sc_m) * _layer_norm(x) + sh_m
        gate = Linear(int(d * cfg.mlp_ratio), use_bias=False, dtype=dt, param_dtype=pdt,
                      name="gate")(h)
        up = Linear(int(d * cfg.mlp_ratio), use_bias=False, dtype=dt, param_dtype=pdt,
                    name="up")(h)
        out = Linear(d, use_bias=False, dtype=dt, param_dtype=pdt, name="down")(
            nn.gelu(gate, approximate=True) * up
        )
        return x + g_m * out


class _PRXCarry(nn.Module):
    cfg: PRXConfig

    @nn.compact
    def __call__(self, x, txt, vec, pe, txt_mask):
        return PRXBlock(self.cfg, name="block")(x, txt, vec, pe, txt_mask), None


def prx_image_ids(h_patches: int, w_patches: int) -> np.ndarray:
    """(row, col) integer ids per patch, matching reference get_image_ids."""
    ids = np.zeros((h_patches * w_patches, 2), dtype=np.int32)
    rr, cc = np.meshgrid(np.arange(h_patches), np.arange(w_patches), indexing="ij")
    ids[:, 0] = rr.reshape(-1)
    ids[:, 1] = cc.reshape(-1)
    return ids


class PRXDiT(nn.Module):
    cfg: PRXConfig

    @nn.compact
    def __call__(self, x, txt, t, pe, txt_mask=None):
        """x: [B, H, W, C] (pixels in [-1,1] for the pixel variant);
        txt: [B, S, context_in_dim]; t in [0,1]; pe: [1|B, L_img, hd/2, 2, 2];
        txt_mask: optional [B, S] bool. Returns the predicted x0, [B, H, W, C].
        """
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        d, p = cfg.hidden_size, cfg.patch_size
        b, hh, ww, c = x.shape

        # img2seq: token feature layout is (C, p, p) to match the torch import
        img = x.reshape(b, hh // p, p, ww // p, p, c)
        img = img.transpose(0, 1, 3, 5, 2, 4).reshape(b, -1, c * p * p)
        if cfg.bottleneck_size is not None:
            img = Linear(cfg.bottleneck_size, dtype=dt, param_dtype=pdt,
                         name="img_in_0")(img.astype(dt))
            img = Linear(d, dtype=dt, param_dtype=pdt, name="img_in_1")(img)
        else:
            img = Linear(d, dtype=dt, param_dtype=pdt, name="img_in")(img.astype(dt))

        txt = Linear(d, dtype=dt, param_dtype=pdt, name="txt_in")(txt.astype(dt))

        temb = _sin_embedding(t, 256, cfg.time_max_period, cfg.time_factor).astype(dt)
        vec = _MLPEmbedder(d, dt, pdt, name="time_in")(temb)
        if cfg.resolution_embeds:
            hw = jnp.concatenate([
                _sin_embedding(jnp.full((b,), float(hh)), 128, cfg.time_max_period, 1.0),
                _sin_embedding(jnp.full((b,), float(ww)), 128, cfg.time_max_period, 1.0),
            ], axis=-1).astype(dt)
            vec = vec + _MLPEmbedder(d, dt, pdt, name="res_embed")(hw)

        if cfg.scan_blocks:
            Carry = nn.remat(_PRXCarry, prevent_cse=False) if cfg.remat else _PRXCarry
            img, _ = nn.scan(
                Carry,
                length=cfg.depth,
                variable_axes={"params": 0, "lora": 0, "loha": 0, "lokr": 0,
                               "dora": 0, "lorm": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: None},
            )(cfg, name="blocks")(img, txt, vec, pe, txt_mask)
        else:
            for i in range(cfg.depth):
                img = PRXBlock(cfg, name=f"block_{i}")(img, txt, vec, pe, txt_mask)

        fmod = Linear(2 * d, dtype=dt, param_dtype=pdt, name="final_mod")(nn.silu(vec))
        f_shift, f_scale = jnp.split(fmod, 2, axis=-1)
        img = (1 + f_scale[:, None]) * _layer_norm(img) + f_shift[:, None]
        img = Linear(cfg.patch_dim, dtype=dt, param_dtype=pdt, name="final_proj")(img)

        # seq2img back to NHWC
        img = img.reshape(b, hh // p, ww // p, c, p, p)
        return img.transpose(0, 1, 4, 2, 5, 3).reshape(b, hh, ww, c)


def prx_lora_targets() -> list[str]:
    return [r"(img_qkv|txt_kv|attn_out|gate|up|down)$"]


def prx_partition_rules():
    from ai_toolkit_tpu.parallel.sharding import PartitionRule

    return [
        PartitionRule(r"(img_qkv|txt_kv|gate|up|mod)/kernel$", ("fsdp", "tp")),
        PartitionRule(r"(attn_out|down)/kernel$", ("tp", "fsdp")),
        PartitionRule(r"kernel$", ("fsdp", None)),
    ]


@register_model
class PRXPixelModel(BaseTpuModel):
    """Pixel-space PRX (prx_pixel): no VAE, x-prediction, noise_scale 2.0.

    Mirrors ``prx_pixel_t2i.py``: identity "VAE" (latents ARE the [-1,1]
    image), the model output is the clean image x0 (the train target), the
    forward-flow noise is ``randn * 2.0``, and sampling converts x0 to a
    velocity ``v = (x_t - x0) / max(t, 0.05)`` with CFG applied on x0.
    """

    arch = "prx_pixel"
    archs = ["prx_pixel", "prx"]
    is_flow_matching = True
    bucket_divisibility = 16  # vae_scale(1) * patch_size(16)
    max_txt_len = 256
    x0_prediction = True
    noise_scale = 2.0

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.dit_config = PRXConfig.tiny()
            self.llm_config = LLMConfig.tiny(qk_head_norm=True)
            self.max_txt_len = 16
        else:
            d = self._config_json("transformer")
            self.dit_config = PRXConfig(
                in_channels=d.get("in_channels", 3),
                patch_size=d.get("patch_size", 16),
                context_in_dim=d.get("context_in_dim", 2048),
                hidden_size=d.get("hidden_size", 1792),
                mlp_ratio=d.get("mlp_ratio", 3.5),
                num_heads=d.get("num_heads", 28),
                depth=d.get("depth", 16),
                axes_dim=tuple(d.get("axes_dim") or (32, 32)),
                theta=float(d.get("theta", 10_000.0)),
                time_factor=float(d.get("time_factor", 1000.0)),
                time_max_period=float(d.get("time_max_period", 10_000.0)),
                bottleneck_size=d.get("bottleneck_size", 1024),
                resolution_embeds=bool(d.get("resolution_embeds", True)),
            )
            te = self._config_json("text_encoder")
            base = LLMConfig.qwen3_2b()
            self.llm_config = LLMConfig(
                vocab_size=te.get("vocab_size", base.vocab_size),
                d_model=te.get("hidden_size", base.d_model),
                n_layers=te.get("num_hidden_layers", base.n_layers),
                n_heads=te.get("num_attention_heads", base.n_heads),
                n_kv_heads=te.get("num_key_value_heads", base.n_kv_heads),
                head_dim=te.get("head_dim", base.head_dim),
                d_ff=te.get("intermediate_size", base.d_ff),
                rope_theta=float(te.get("rope_theta", base.rope_theta)),
                rms_eps=float(te.get("rms_norm_eps", base.rms_eps)),
                qk_head_norm=True,
            )
        self.dit = PRXDiT(self.dit_config)
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
                d = json.load(f)
            # Qwen3-VL wraps the text dims in text_config
            return d.get("text_config", d) if sub == "text_encoder" else d
        return dict(self.config.model_kwargs.get(f"{sub}_config", {}))

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_te = jax.random.split(rng)
        cfg = self.dit_config
        p = cfg.patch_size
        pe = self.rope_table(2 * p, 2 * p)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 2 * p, 2 * p, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.context_in_dim)), jnp.zeros((1,)), pe,
        )
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_prx_checkpoint

            return load_prx_checkpoint(path, self)
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
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        txt = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        p = self.dit_config.patch_size
        ids = prx_image_ids(latent_h // p, latent_w // p)
        return multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    def predict(self, variables, noisy_latents, t, cond):
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        return self.dit.apply(
            colls, noisy_latents, cond["txt"], t, cond["pe"], cond.get("txt_mask")
        )

    # ---- pixel space: the "latents" ARE the image in [-1, 1] ----

    def encode_images(self, variables, images, rng=None):
        return images

    def decode_latents(self, variables, latents):
        return jnp.clip(latents, -1.0, 1.0)

    def latent_shape(self, height: int, width: int):
        return height, width, self.dit_config.in_channels

    def image_seq_len(self, height: int, width: int) -> int:
        p = self.dit_config.patch_size
        return (height // p) * (width // p)

    def lora_targets(self):
        return prx_lora_targets()

    def partition_rules(self):
        return prx_partition_rules()
