"""SD3-class MMDiT model wrapper.

Parity target: the reference's sd3 arch (``is_v3`` path in
``toolkit/stable_diffusion_model.py``): MMDiT joint text+image attention
blocks, triple text conditioning (CLIP-L + OpenCLIP-G penultimate states
zero-padded to the T5 width and concatenated with T5; pooled = concat of both
CLIP pooled projections), 16-ch VAE, flow matching with static shift=3.

The transformer reuses FluxDiT double blocks with a zero-angle RoPE table
(identity rotation) — MMDiT blocks are flux double blocks without rotary
embeddings; image positions come from a learned/abs embedding folded into the
tokens host-side.
"""

from __future__ import annotations

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
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class SD3Model(BaseTpuModel):
    arch = "sd3"
    archs = ["sd3", "sd35", "sd35_large"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 154  # 77 clip + t5 tail (sd3 convention: 77+77)

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "medium")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(
                **{**base.__dict__, "depth_single": 0, "guidance_embed": False}
            )
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.clip2_config = CLIPTextConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        else:
            large = size in ("large", "8b")
            self.dit_config = FluxConfig(
                in_channels=64, hidden_size=2432 if large else 1536,
                num_heads=38 if large else 24, head_dim=64,
                depth_double=38 if large else 24, depth_single=0,
                context_dim=4096, vec_dim=2048, guidance_embed=False,
                axes_dim=(64,),  # identity table; positions are additive embeds
            )
            self.vae_config = VAEConfig.flux()  # sd3 uses a 16ch vae, scale ~1.5305
            self.clip_config = CLIPTextConfig.clip_l()
            self.clip2_config = CLIPTextConfig.open_clip_g()
            self.t5_config = T5Config.xxl()
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.clip2 = CLIPTextModel(self.clip2_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )
        self.tokenizer_t5 = load_tokenizer(
            config.name_or_path, "tokenizer_3", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r1, r2, r3 = jax.random.split(rng, 5)
        cfg = self.dit_config
        n_img, n_txt = 16, 8
        pe = self._identity_pe(n_txt + n_img)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n_img, cfg.in_channels)), jnp.zeros((1, n_txt, cfg.context_dim)),
            jnp.zeros((1,)), jnp.zeros((1, cfg.vec_dim)), pe, None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "clip": self.clip.init(r1, jnp.zeros((1, 77), jnp.int32))["params"],
            "clip2": self.clip2.init(r2, jnp.zeros((1, 77), jnp.int32))["params"],
            "t5": self.t5.init(r3, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        return self.init_variables(rng)

    def _identity_pe(self, n: int) -> jnp.ndarray:
        """Zero-angle rope table == identity rotation (MMDiT has no RoPE)."""
        d2 = self.dit_config.head_dim // 2
        table = jnp.zeros((1, n, d2, 2, 2))
        return table.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = jnp.asarray(np.stack([self.tokenizer.encode(p) for p in prompts]))
        t5_ids = jnp.asarray(np.stack([self.tokenizer_t5.encode(p) for p in prompts]))
        o1 = jax.jit(self.clip.apply, static_argnums=2)({"params": variables["clip"]}, ids, 1)
        o2 = jax.jit(self.clip2.apply, static_argnums=2)({"params": variables["clip2"]}, ids, 1)
        t5_out = jax.jit(self.t5.apply)({"params": variables["t5"]}, t5_ids)
        clip_cat = jnp.concatenate([o1["last_hidden_state"], o2["last_hidden_state"]], axis=-1)
        pad = self.dit_config.context_dim - clip_cat.shape[-1]
        clip_cat = jnp.pad(clip_cat, ((0, 0), (0, 0), (0, max(pad, 0))))[..., : self.dit_config.context_dim]
        txt = jnp.concatenate([clip_cat, t5_out], axis=1)
        pooled = jnp.concatenate([o1["pooled_output"], o2["pooled_output"]], axis=-1)
        pad_p = self.dit_config.vec_dim - pooled.shape[-1]
        pooled = jnp.pad(pooled, ((0, 0), (0, max(pad_p, 0))))[..., : self.dit_config.vec_dim]
        return {"txt": txt, "y": pooled}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        return self._identity_pe(txt_len + (latent_h // 2) * (latent_w // 2))

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "quant"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["y"], cond["pe"], None)
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
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)
