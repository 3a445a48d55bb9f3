"""OmniGen2 model wrapper.

Parity target: the reference plugin
``extensions_built_in/diffusion_models/omnigen2/`` — a decoupled design: a
Qwen2.5-VL(-3B) multimodal LLM provides conditioning hidden states (2048-d),
and a separate rectified-flow diffusion transformer (32 layers, 21 heads x
120 = hidden 2520, RoPE) denoises FLUX-VAE latents. Reference/edit images
are VAE-encoded and joined to the token sequence (in-context conditioning),
which is how omnigen2 does instruction-based editing.

Maps to FluxDiT single-stream (depth_double=0) with sequence-concat control
latents, like the qwen edit family.
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
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class OmniGen2Model(BaseTpuModel):
    arch = "omnigen2"
    archs = ["omnigen2"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 256

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
                in_channels=64, hidden_size=2520, num_heads=21, head_dim=120,
                depth_double=0, depth_single=32, context_dim=2048, vec_dim=256,
                guidance_embed=False, axes_dim=(40, 40, 40),
            )
            self.vae_config = VAEConfig.flux()
            # Qwen2.5-VL-3B text tower
            self.llm_config = LLMConfig(
                vocab_size=151_936, d_model=2048, n_layers=36, n_heads=16, n_kv_heads=2,
                head_dim=128, d_ff=11008, rope_theta=1_000_000.0, qkv_bias=True,
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
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim)),
                "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids = image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len)
        table = multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )
        # reference-image tokens: same grid on frame axis 1 (in-context edit)
        cids = np.asarray(image_position_ids(latent_h // 2, latent_w // 2, text_len=0)).copy()
        cids[:, 0] = 1
        ctable = multi_axis_rope(
            jnp.asarray(cids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )
        self._ctrl_table = ctable  # appended lazily in predict when control present
        return table

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents(noisy_latents)
        n_img = img.shape[1]
        pe = cond["pe"]
        if cond.get("control_latents") is not None:
            img = jnp.concatenate([img, pack_latents(cond["control_latents"])], axis=1)
            if pe.shape[1] < cond["txt"].shape[1] + img.shape[1] and hasattr(self, "_ctrl_table"):
                pe = jnp.concatenate([pe, self._ctrl_table], axis=1)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "quant"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(
            colls, img, cond["txt"], t, cond["y"], pe, None, cond.get("txt_mask")
        )
        return unpack_latents(out[:, :n_img], h, w)

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
