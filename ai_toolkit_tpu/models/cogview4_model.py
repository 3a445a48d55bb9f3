"""CogView4 model wrapper.

Parity target: the reference's built-in CogView4 model
(``/root/reference/toolkit/models/cogview4.py``, registered in
``toolkit/util/get_model.py:13-17``): a single-stream joint DiT — text
(GLM-4 hidden states, 4096-d) and image tokens share QKV in every block —
28 layers, hidden 4096 (32 heads x 128), 2D RoPE on image tokens, adaLN
modulation from the timestep (+ size micro-conds folded in at full scale),
SD-style 16-ch VAE, flow matching.

Maps to FluxDiT with depth_double=0 (text rides txt_in into the joint
single-stream stage).
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
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class CogView4Model(BaseTpuModel):
    checkpoint_importable = False  # structural-only: refuses name_or_path
    arch = "cogview4"
    archs = ["cogview4"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 224

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__, "depth_double": 0, "depth_single": 2, "guidance_embed": False,
            })
            self.vae_config = VAEConfig.tiny()
            self.llm_config = LLMConfig.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = FluxConfig(
                in_channels=64, hidden_size=4096, num_heads=32, head_dim=128,
                depth_double=0, depth_single=28, context_dim=4096, vec_dim=256,
                guidance_embed=False, axes_dim=(64, 64),
            )
            self.vae_config = VAEConfig.flux()
            # GLM-4-9B text tower
            self.llm_config = LLMConfig(
                vocab_size=151_552, d_model=4096, n_layers=40, n_heads=32, n_kv_heads=2,
                head_dim=128, d_ff=13696, rope_theta=10_000.0,
            )
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        n_img, n_txt = 16, 8
        pe = jnp.zeros((1, n_txt + n_img, cfg.head_dim // 2, 2, 2))
        pe = pe.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
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
            "te": self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        return self.refuse_or_init(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim))}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids = np.asarray(image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len))
        dims = list(self.dit_config.axes_dim)  # 2D rope at full scale, 3-axis tiny
        return multi_axis_rope(
            jnp.asarray(ids[:, -len(dims):])[None], dims, self.dit_config.theta
        )

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
