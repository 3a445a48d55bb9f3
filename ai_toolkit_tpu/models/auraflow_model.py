"""AuraFlow model wrapper — exact diffusers ``AuraFlowTransformer2DModel``.

Parity target: the reference's auraflow arch (``is_auraflow`` path in
``toolkit/stable_diffusion_model.py:572-636`` load, ``:2231-2243`` predict —
t in [0,1] with t=1 noise, i.e. the standard flow-matching convention here).
4 joint MMDiT blocks + 32 single-stream DiT blocks, hidden 3072 (12 heads x
256), Pile-T5-XL text conditioning (2048-d UMT5-style encoder; embeddings
zeroed at padded positions per ``train_tools.encode_prompts_auraflow:469-508``),
learned absolute position embeddings with center-crop selection, 4-ch SDXL
VAE latents packed 2x2 channel-major (``toolkit/models/auraflow.py:30-48``),
flow matching. See models/auraflow_dit.py for the block-level pins.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.auraflow_dit import (
    AuraFlowConfig,
    AuraFlowDiT,
    auraflow_lora_targets,
    auraflow_partition_rules,
)
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.flux_dit import pack_latents_cmajor, unpack_latents
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class AuraFlowModel(BaseTpuModel):
    arch = "auraflow"
    archs = ["auraflow"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 256

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.t5_config = T5Config.tiny()
            self.dit_config = AuraFlowConfig.tiny(
                context_dim=self.t5_config.d_model,
                pos_embed_max_size=4096,  # 64x64 grid: covers test resolutions
            )
            self.vae_config = VAEConfig.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = AuraFlowConfig()
            self.vae_config = VAEConfig.sdxl()  # auraflow ships the fp16-fixed SDXL VAE
            # Pile-T5-XL (UMT5-style per-layer relative bias)
            self.t5_config = T5Config(d_model=2048, d_kv=64, d_ff=5120,
                                      num_layers=24, num_heads=32,
                                      per_layer_bias=True)
        self.dit = AuraFlowDiT(self.dit_config)
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
            jnp.zeros((1, 8, cfg.context_dim)), jnp.zeros((1,)), 4, 4,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "t5": self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_auraflow_checkpoint

            return load_auraflow_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        # attention mask: tokens up to and including eos are real
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.float32)
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        # encode_prompts_auraflow: prompt_embeds * attention_mask
        txt = txt * jnp.asarray(mask)[..., None]
        return {"txt": txt}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        return jnp.zeros((1, 1))  # learned absolute pos embed; no rope

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        p = self.dit_config.patch_size
        img = pack_latents_cmajor(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, h // p, w // p)
        # diffusers unpatchify is patch-major with channels LAST (nhwpqc)
        return unpack_latents(out, h, w)

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
        return auraflow_lora_targets()

    def lora_key_map(self, lora) -> dict:
        from ai_toolkit_tpu.models.auraflow_dit import auraflow_lora_key_map

        return auraflow_lora_key_map(lora)

    def lora_inverse_key_map(self, key_map: dict) -> dict:
        from ai_toolkit_tpu.models.auraflow_dit import auraflow_inverse_key_map

        return auraflow_inverse_key_map(
            key_map, self.dit_config.n_double, self.dit_config.n_single
        )

    def partition_rules(self):
        return auraflow_partition_rules(self.dit_config.scan_blocks)
