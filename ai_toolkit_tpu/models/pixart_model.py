"""PixArt model wrapper — exact diffusers ``PixArtTransformer2DModel``.

Parity target: the reference's pixart / pixart_sigma archs
(``toolkit/stable_diffusion_model.py:486-536`` load, ``:2080-2128`` predict):
T5-XXL-conditioned adaLN-single DiT, epsilon prediction with learned sigma
(the caller keeps the first out-channel half, :2125-2128), integer DDPM
timesteps, ``encoder_attention_mask`` text padding, resolution/aspect
micro-conditioning for the alpha-1024 config (:2103-2113). alpha trains on
the SD 4-ch VAE; sigma on the SDXL VAE (:500-501). 120-token prompts for
alpha, 300 for sigma (:2432). See models/pixart_dit.py for block-level pins.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.pixart_dit import (
    PixArtConfig,
    PixArtDiT,
    pixart_lora_targets,
    pixart_partition_rules,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class PixArtModel(BaseTpuModel):
    arch = "pixart"
    archs = ["pixart", "pixart_sigma"]
    is_flow_matching = False
    bucket_divisibility = 16
    max_txt_len = 120  # alpha; sigma uses 300 (stable_diffusion_model.py:2432)

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if config.arch == "pixart_sigma":
            self.max_txt_len = 300
        if size == "tiny":
            self.t5_config = T5Config.tiny()
            self.dit_config = PixArtConfig.tiny(caption_dim=self.t5_config.d_model)
            self.vae_config = VAEConfig.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = PixArtConfig(
                micro_cond=config.arch == "pixart",  # alpha-1024 default
            )
            # sigma ships the SDXL vae; alpha the SD one (ref :500-501)
            self.vae_config = VAEConfig.sdxl() if config.arch == "pixart_sigma" else VAEConfig.sd()
            self.t5_config = T5Config.xxl()
        self.dit = PixArtDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_t5 = jax.random.split(rng, 3)
        cfg = self.dit_config
        p = cfg.patch_size
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 16, p * p * cfg.in_channels)),
            jnp.zeros((1, 8, cfg.caption_dim)), jnp.zeros((1,)), 4, 4,
            jnp.ones((1, 8)),
            jnp.zeros((1, 2)) if cfg.micro_cond else None,
            jnp.ones((1,)) if cfg.micro_cond else None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "t5": t5_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_pixart_checkpoint

            return load_pixart_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.float32)
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt, "txt_mask": jnp.asarray(mask)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        return jnp.zeros((1, 1))  # parameter-free sincos pos embed; no rope

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, h, w, C]; t: DDPM integer timesteps [B]."""
        b, h, w, c = noisy_latents.shape
        cfg = self.dit_config
        p = cfg.patch_size
        from ai_toolkit_tpu.models.flux_dit import pack_latents_cmajor, unpack_latents

        tokens = pack_latents_cmajor(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        res = ar = None
        if cfg.micro_cond:
            d = self.vae_config.downscale
            res = jnp.tile(jnp.array([[h * d, w * d]], jnp.float32), (b, 1))
            ar = jnp.full((b,), float(h) / float(w))
        out = self.dit.apply(colls, tokens, cond["txt"], t, h // p, w // p,
                             cond.get("txt_mask"), res, ar)
        out = unpack_latents(out, h, w)  # diffusers nhwpqc unpatchify
        if cfg.learned_sigma:
            out = out[..., : cfg.in_channels]  # ref :2125-2128 chunk(2)[0]
        return out

    def encode_images(self, variables, images, rng=None):
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return (h // 2) * (w // 2)

    def lora_targets(self):
        return pixart_lora_targets()

    def lora_key_map(self, lora) -> dict:
        from ai_toolkit_tpu.models.pixart_dit import pixart_lora_key_map

        return pixart_lora_key_map(lora)

    def lora_inverse_key_map(self, key_map: dict) -> dict:
        from ai_toolkit_tpu.models.pixart_dit import pixart_inverse_key_map

        return pixart_inverse_key_map(key_map, self.dit_config.n_layers)

    def partition_rules(self):
        return pixart_partition_rules(self.dit_config.scan_blocks)
