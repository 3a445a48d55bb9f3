"""Lumina-Image-2.0 model wrapper — exact Lumina2Transformer2DModel.

Parity target: the reference's lumina2 arch (``is_lumina2`` path,
``toolkit/stable_diffusion_model.py:849-881`` load / ``:2207-2220`` predict):
the NextDiT-2B single-stream joint transformer (see models/lumina2_dit.py for
the vendored-source pins), Gemma2-2B caption states (2304-d), 16-ch FLUX VAE,
flow matching (the reference samples with its flowmatch scheduler and a
static shift of 6).

Prediction conventions (stable_diffusion_model.py:2207-2220): the model's
time axis is reversed (t=0 noise, t=1 image) so it receives ``1 - t``, and
the raw output is negated before entering the flow-matching loss/step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.flux_dit import pack_latents, unpack_latents
from ai_toolkit_tpu.models.lumina2_dit import (
    Lumina2Config,
    Lumina2DiT,
    lumina2_lora_targets,
    lumina2_partition_rules,
    lumina2_pos_angles,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class Lumina2Model(BaseTpuModel):
    arch = "lumina2"
    archs = ["lumina2"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 256
    flowmatch_shift = 6.0  # lumina2 trains/samples at shift 6

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.dit_config = Lumina2Config.tiny()
            self.vae_config = VAEConfig.tiny()
            self.llm_config = LLMConfig.tiny(d_model=self.dit_config.cap_feat_dim)
            self.max_txt_len = 16
        else:
            self.dit_config = Lumina2Config()
            self.vae_config = VAEConfig.flux()
            self.llm_config = LLMConfig.gemma2_2b()
        self.dit = Lumina2DiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        n_img, n_txt = 16, 8
        ta, ia = lumina2_pos_angles(cfg, 4, 4, jnp.full((1,), n_txt), n_txt)
        dit_vars = self.dit.init(
            r_dit,
            jnp.zeros((1, n_img, cfg.patch_size**2 * cfg.in_channels)),
            jnp.zeros((1, n_txt, cfg.cap_feat_dim)),
            jnp.zeros((1,)), jnp.ones((1, n_txt), bool), ia, ta,
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
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_lumina2_checkpoint

            return load_lumina2_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt, "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        # angles are built per-sample inside predict (caption lengths are
        # dynamic); the trainer's shared pe slot is unused
        return jnp.zeros((1, 1))

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        txt = cond["txt"]
        mask = cond.get("txt_mask")
        if mask is None:
            mask = jnp.ones((b, txt.shape[1]), bool)
        mask = jnp.broadcast_to(mask.astype(bool), (b, txt.shape[1]))
        cap_lens = mask.sum(axis=1)
        ta, ia = lumina2_pos_angles(self.dit_config, h // 2, w // 2, cap_lens, txt.shape[1])
        # lumina time axis is reversed; the raw prediction is negated
        # (stable_diffusion_model.py:2209,2220)
        out = self.dit.apply(colls, img, txt, 1.0 - t, mask, ia, ta)
        return -unpack_latents(out, h, w)

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
        return lumina2_lora_targets()

    def partition_rules(self):
        return lumina2_partition_rules(self.dit_config.scan_blocks)
