"""PixArt-class model wrapper (eps-prediction cross-attention DiT).

Parity target: the reference's pixart/pixart_sigma archs
(``is_pixart`` path in ``toolkit/stable_diffusion_model.py``): T5-conditioned
DiT with adaLN-single modulation, epsilon prediction on the SD 4-ch VAE.
The transformer is the WanDiT run in 2D mode (t=1): same block math
(self-attn with RoPE -> cross-attn to text -> FFN, shared time projection +
per-block modulation table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.models.wan_dit import (
    WanConfig,
    WanDiT,
    multi_axis_rope,
    wan_lora_targets,
    wan_partition_rules,
    wan_patchify,
    wan_position_ids,
    wan_unpatchify,
)
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class PixArtModel(BaseTpuModel):
    checkpoint_importable = False  # structural-only: refuses name_or_path
    arch = "pixart"
    archs = ["pixart", "pixart_sigma"]
    is_flow_matching = False
    bucket_divisibility = 16
    max_txt_len = 120  # pixart uses 120-token T5 prompts

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = WanConfig.tiny()
            self.dit_config = WanConfig(**{**base.__dict__, "axes_dim": (0, 8, 8)})
            self.vae_config = VAEConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = WanConfig(
                in_channels=4, dim=1152, ffn_dim=4608, num_heads=16, num_layers=28,
                text_dim=4096, axes_dim=(0, 36, 36),
            )
            # pixart-sigma uses the SDXL vae; alpha the SD one
            self.vae_config = VAEConfig.sdxl() if config.arch == "pixart_sigma" else VAEConfig.sd()
            self.t5_config = T5Config.xxl()
        self.dit = WanDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_t5 = jax.random.split(rng, 3)
        cfg = self.dit_config
        pt, ph, pw = cfg.patch_size
        n = 4
        patch_dim = cfg.in_channels * pt * ph * pw
        pe = jnp.zeros((1, n, cfg.head_dim // 2, 2, 2))
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n, patch_dim)), jnp.zeros((1, 8, cfg.text_dim)),
            jnp.zeros((1,)), pe, None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "t5": t5_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        return self.refuse_or_init(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        cfg = self.dit_config
        _, ph, pw = cfg.patch_size
        ids = wan_position_ids(1, latent_h // ph, latent_w // pw)
        dims = [d for d in cfg.axes_dim if d > 0]
        return multi_axis_rope(ids[..., -len(dims):], dims)

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, h, w, C]; t: DDPM integer timesteps [B]."""
        b, h, w, c = noisy_latents.shape
        cfg = self.dit_config
        tokens = wan_patchify(noisy_latents[:, None], cfg.patch_size)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        t01 = t.astype(jnp.float32) / 1000.0
        out = self.dit.apply(colls, tokens, cond["txt"], t01, cond["pe"], None)
        return wan_unpatchify(out, 1, h, w, cfg.patch_size, c)[:, 0]

    def encode_images(self, variables, images, rng=None):
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def lora_targets(self):
        return wan_lora_targets()

    def partition_rules(self):
        return wan_partition_rules(self.dit_config.scan_blocks)
