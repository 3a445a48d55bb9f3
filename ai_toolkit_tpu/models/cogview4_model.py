"""CogView4 model wrapper — diffusers ``CogView4Transformer2DModel`` layout.

Parity target: the reference's built-in CogView4 model
(``/root/reference/toolkit/models/cogview4.py``): GLM-4-9B text states
(EXACT — our LLMEncoder glm flavor is golden-tested vs transformers
``GlmModel``), the CogView4 DiT (see models/cogview4_dit.py for the layout
pins and derivation note), 16-ch VAE, flow matching with the vendored
linear-dynamic-shift scheduler config (:45-59; wired via
``samplers/factory.py`` arch defaults). Prediction (:252-281): timestep on
the 0..1000 scale, original/target size = pixel dims, crop (0, 0).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.cogview4_dit import (
    CogView4Config,
    CogView4DiT,
    cogview4_lora_targets,
    cogview4_partition_rules,
    cogview4_rope,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class CogView4Model(BaseTpuModel):
    arch = "cogview4"
    archs = ["cogview4"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 224

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.llm_config = LLMConfig.tiny()
            self.dit_config = CogView4Config.tiny(text_embed_dim=self.llm_config.d_model)
            self.vae_config = VAEConfig.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = CogView4Config()
            self.vae_config = VAEConfig.flux()  # 16-ch AutoencoderKL
            self.llm_config = LLMConfig.glm4_9b()
        self.dit = CogView4DiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        p = cfg.patch_size
        ang = jnp.asarray(cogview4_rope(cfg, 4, 4))
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, 16, p * p * cfg.in_channels)),
            jnp.zeros((1, 8, cfg.text_embed_dim)), jnp.zeros((1,)), ang,
            jnp.zeros((1, 2)), jnp.zeros((1, 2)), jnp.zeros((1, 2)),
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "te": self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_cogview4_checkpoint

            return load_cogview4_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int = 0) -> jnp.ndarray:
        p = self.dit_config.patch_size
        return jnp.asarray(cogview4_rope(self.dit_config, latent_h // p, latent_w // p))

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        cfg = self.dit_config
        p = cfg.patch_size
        from ai_toolkit_tpu.models.flux_dit import (
            pack_latents_cmajor,
            unpack_latents_cmajor,
        )

        img = pack_latents_cmajor(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        ang = cond.get("pe")
        if ang is None or ang.ndim != 2:
            ang = jnp.asarray(cogview4_rope(cfg, h // p, w // p))
        d = self.vae_config.downscale
        size = jnp.tile(jnp.array([[h * d, w * d]], jnp.float32), (b, 1))
        crop = jnp.zeros((b, 2), jnp.float32)
        # reference passes the 0..1000 timestep scale (cogview4.py:255)
        out = self.dit.apply(colls, img, cond["txt"], t * 1000.0, ang,
                             size, size, crop)
        # cogview4 unpatchify is channel-major both directions (reshape
        # (..., c, p, p) -> permute(0,3,1,4,2,5))
        return unpack_latents_cmajor(out, h, w)

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
        return cogview4_lora_targets()

    def lora_key_map(self, lora) -> dict:
        from ai_toolkit_tpu.models.cogview4_dit import cogview4_lora_key_map

        return cogview4_lora_key_map(lora)

    def lora_inverse_key_map(self, key_map: dict) -> dict:
        from ai_toolkit_tpu.models.cogview4_dit import cogview4_inverse_key_map

        return cogview4_inverse_key_map(key_map, self.dit_config.n_layers)

    def partition_rules(self):
        return cogview4_partition_rules(self.dit_config.scan_blocks)
