"""SD3-class MMDiT model wrapper — exact diffusers SD3Transformer2DModel
semantics.

Parity target: the reference's sd3 arch (``is_v3`` path in
``toolkit/stable_diffusion_model.py:396`` loads diffusers
``SD3Transformer2DModel``): MMDiT joint text+image attention blocks, triple
text conditioning (CLIP-L + OpenCLIP-G penultimate states zero-padded to the
T5 width and concatenated with T5; pooled = concat of both CLIP pooled
projections), 16-ch VAE (scale 1.5305 / shift 0.0609), flow matching with
static shift=3.

Exact-layout notes (vs the generic flux double block):
- learned absolute pos_embed table (``pos_embed.pos_embed``), center-cropped
  per resolution; zero-angle RoPE (identity rotation) since MMDiT has no RoPE
- sd3-medium has NO q/k norm (``qk_norm=False``); sd3.5 uses per-head RMS
- the LAST block is context_pre_only (txt normed by AdaLayerNormContinuous,
  no txt out-proj/FFN)
- sd3.5-medium puts a second img-only self-attention (attn2) in the first 13
  blocks (``dual_attention_layers``)
- ``norm_out.linear`` emits (scale, shift) — swapped to our (shift, scale)
  at import (``io/sd3_import.py``)
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
                **{**base.__dict__, "depth_single": 0, "guidance_embed": False,
                   "final_context_pre_only": True, "pos_embed_max_size": 32,
                   "qk_norm": False}
            )
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.clip2_config = CLIPTextConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        else:
            # diffusers transformer/config.json per variant:
            #   sd3 (2B medium):   24 layers, d=1536, no qk norm
            #   sd3.5-medium:      24 layers, d=1536, qk rms, attn2 in blocks
            #                      0..12, pos_embed_max_size 384
            #   sd3.5-large (8B):  38 layers, d=2432, qk rms
            large = size in ("large", "8b") or self.config.arch == "sd35_large"
            is_35 = self.config.arch != "sd3" or size in ("35", "3.5")
            self.dit_config = FluxConfig(
                in_channels=64, hidden_size=2432 if large else 1536,
                num_heads=38 if large else 24, head_dim=64,
                depth_double=38 if large else 24, depth_single=0,
                context_dim=4096, vec_dim=2048, guidance_embed=False,
                axes_dim=(64,),  # identity rope table (MMDiT has none)
                qk_norm=is_35,
                final_context_pre_only=True,
                pos_embed_max_size=384 if (is_35 and not large) else 192,
                dual_attention_layers=13 if (is_35 and not large) else 0,
            )
            self.vae_config = VAEConfig.sd3()
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
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.sd3_import import load_sd3_checkpoint

            return load_sd3_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def _pos_ids(self, latent_h: int, latent_w: int) -> jnp.ndarray:
        """Center-cropped rows into the learned pos table (diffusers
        PatchEmbed.cropped_pos_embed)."""
        m = self.dit_config.pos_embed_max_size
        h2, w2 = latent_h // 2, latent_w // 2
        top, left = (m - h2) // 2, (m - w2) // 2
        rows = np.arange(top, top + h2)[:, None] * m + np.arange(left, left + w2)[None]
        return jnp.asarray(rows.reshape(-1), jnp.int32)

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
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["y"], cond["pe"], None,
                             pos_ids=self._pos_ids(h, w))
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
