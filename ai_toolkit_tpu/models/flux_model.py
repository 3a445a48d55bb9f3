"""FLUX model family wrapper: DiT + VAE + CLIP/T5 conditioning.

Parity target: the reference's flux arch
(``/root/reference/toolkit/stable_diffusion_model.py`` is_flux path and the
flux plugin models): flow matching, dynamic shift, guidance embedding, T5+CLIP
dual conditioning, 16-ch VAE with packing.
"""

from __future__ import annotations

import os
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.flux_dit import (
    FluxConfig,
    FluxDiT,
    flux_lora_targets,
    flux_partition_rules,
    pack_latents,
    unpack_latents,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import CLIPTextConfig, CLIPTextModel, T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class FluxModel(BaseTpuModel):
    arch = "flux"
    archs = ["flux", "flex1", "flex2", "flux_schnell", "flux_kontext", "chroma", "krea2"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "dev")
        if size == "tiny":
            self.dit_config = FluxConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        elif size == "bench_2b":
            self.dit_config = FluxConfig.bench_2b()
            self.vae_config = VAEConfig.flux()
            self.clip_config = CLIPTextConfig.clip_l()
            self.t5_config = T5Config.xxl()
        else:
            self.dit_config = (
                FluxConfig.schnell() if config.arch == "flux_schnell" else FluxConfig.dev()
            )
            self.vae_config = VAEConfig.flux()
            self.clip_config = CLIPTextConfig.clip_l()
            self.t5_config = T5Config.xxl()
        if config.arch == "flux_schnell":
            self.dit_config = FluxConfig(**{**self.dit_config.__dict__, "guidance_embed": False})
        if config.arch == "chroma":
            # chroma prunes time_in/vector_in/guidance_in: ALL modulation
            # vectors come from the distilled-guidance Approximator
            # (reference chroma/src/model.py:118; approximator 64->5120x5)
            size = config.model_kwargs.get("size", "full")
            self.dit_config = FluxConfig(**{
                **self.dit_config.__dict__, "guidance_embed": False, "chroma_mod": True,
                "approximator_hidden": 64 if size == "tiny" else 5120,
                "approximator_depth": 2 if size == "tiny" else 5,
            })
        if config.model_kwargs.get("control") or config.arch in ("flux_kontext", "flex2"):
            # control/edit conditioning: packed control latents concat to img tokens
            base_in = self.dit_config.in_channels
            self.dit_config = FluxConfig(**{
                **self.dit_config.__dict__,
                "in_channels": base_in * 2,
                "out_channels": base_in,
                "control_channels": base_in,
            })
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer_clip = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )
        self.tokenizer_t5 = load_tokenizer(
            config.name_or_path, "tokenizer_2", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    # ---- construction ----

    def init_variables(self, rng: jax.Array) -> dict:
        """Random init of all components at tiny cost via jit-eval_shape... (real init)."""
        r_dit, r_vae, r_clip, r_t5 = jax.random.split(rng, 4)
        cfg = self.dit_config
        n_img, n_txt = 16, 8
        pe = jnp.zeros((1, n_txt + n_img, cfg.head_dim // 2, 2, 2))
        dit_vars = self.dit.init(
            r_dit,
            jnp.zeros((1, n_img, cfg.in_channels), cfg.dtype),
            jnp.zeros((1, n_txt, cfg.context_dim), cfg.dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.vec_dim)),
            pe,
            jnp.zeros((1,)),
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3)),
        )
        clip_vars = self.clip.init(r_clip, jnp.zeros((1, 77), jnp.int32))
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "clip": clip_vars["params"],
            "t5": t5_vars["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and os.path.isdir(path):
            from ai_toolkit_tpu.io.flux_import import load_flux_checkpoint

            return load_flux_checkpoint(path, self)
        return self.init_variables(rng)

    # ---- conditioning ----

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        clip_ids = np.stack([self.tokenizer_clip.encode(p) for p in prompts])
        t5_ids = np.stack([self.tokenizer_t5.encode(p) for p in prompts])
        clip_out = jax.jit(self.clip.apply)({"params": variables["clip"]}, jnp.asarray(clip_ids))
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(t5_ids))
        out = {"txt": txt, "y": clip_out["pooled_output"]}
        if self.config.attn_masking:
            # non-padding = everything up to and including the first eos
            ids = np.asarray(t5_ids)
            is_eos = ids == 1
            out["txt_mask"] = jnp.asarray(np.cumsum(is_eos, axis=1) - is_eos <= 0)
        return out

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids = image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len)
        return multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    # ---- forward ----

    def predict(self, variables: dict, noisy_latents: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        """noisy_latents: [B, h, w, C] (VAE latent space). cond: txt, y, pe, guidance,
        optional control_latents [B, h, w, C_ctrl] (channel-concat conditioning)."""
        b, h, w, c = noisy_latents.shape
        img = pack_latents(noisy_latents)
        if cond.get("control_latents") is not None:
            img = jnp.concatenate([img, pack_latents(cond["control_latents"])], axis=-1)
        pe = cond["pe"]
        out = self.dit.apply(
            {"params": variables["dit"], **{k: v for k, v in variables.items() if k in ("lora", "loha", "lokr", "dora", "quant")}},
            img,
            cond["txt"],
            t,
            cond["y"],
            pe,
            cond.get("guidance"),
            cond.get("txt_mask"),
        )
        return unpack_latents(out, h, w)

    def encode_images(self, variables: dict, images: jax.Array, rng=None) -> jax.Array:
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables: dict, latents: jax.Array) -> jax.Array:
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    # ---- geometry / wiring ----

    def latent_shape(self, height: int, width: int) -> tuple[int, int, int]:
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return (h // 2) * (w // 2)

    def lora_targets(self) -> list[str]:
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)
