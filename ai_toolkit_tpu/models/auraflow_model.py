"""AuraFlow model wrapper.

Parity target: the reference's auraflow arch (``is_auraflow`` path in
``toolkit/stable_diffusion_model.py``; diffusers ``AuraFlowTransformer2DModel``):
4 joint MMDiT blocks + 32 single-stream DiT blocks, hidden 3072, 12 heads x
256, Pile-T5 text conditioning (2048-d, no pooled vector), learned absolute
position embeddings (no RoPE -> identity rotation table here, positions are
additive), 4-ch VAE latents packed 2x2, flow matching.

The joint/single split maps 1:1 onto FluxDiT's double/single stages; the
timestep-only modulation is expressed with a zero pooled vector.
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
    pack_latents_cmajor,
    unpack_latents_cmajor,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class AuraFlowModel(BaseTpuModel):
    checkpoint_importable = False  # structural-only: refuses name_or_path
    arch = "auraflow"
    archs = ["auraflow"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 256

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__, "depth_double": 1, "depth_single": 2, "guidance_embed": False,
            })
            self.vae_config = VAEConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = FluxConfig(
                in_channels=16, hidden_size=3072, num_heads=12, head_dim=256,
                depth_double=4, depth_single=32, context_dim=2048, vec_dim=256,
                guidance_embed=False, axes_dim=(256,),
            )
            self.vae_config = VAEConfig.sdxl()  # auraflow trains on the fp16-fixed SDXL VAE
            # Pile-T5-XL encoder (UMT5-family); shared-bias T5 is the stand-in
            self.t5_config = T5Config(d_model=2048, d_ff=5120, num_layers=24, num_heads=32)
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_t5 = jax.random.split(rng, 3)
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
            "t5": self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        return self.refuse_or_init(rng)

    def _identity_pe(self, n: int) -> jnp.ndarray:
        d2 = self.dit_config.head_dim // 2
        table = jnp.zeros((1, n, d2, 2, 2))
        return table.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim))}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        return self._identity_pe(txt_len + (latent_h // 2) * (latent_w // 2))

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents_cmajor(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["y"], cond["pe"], None)
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
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)
