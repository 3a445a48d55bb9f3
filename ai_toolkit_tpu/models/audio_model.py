"""ACE-Step-class audio model: latent audio flow matching.

Parity target: the reference's audio family
(``extensions_built_in/audio_models/ace_step/ace_step_15_model.py`` on
``BaseAudioModel``): waveform -> latent VAE -> DiT with text (tags/lyrics)
conditioning, flow-matching objective. The transformer is the WanDiT run in
1D mode (latent [B, t, 1, 1, C], time-axis RoPE only) — same block math,
zero extra code to maintain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.audio_vae import AudioAutoencoderKL, AudioVAEConfig
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.wan_dit import (
    WanConfig,
    WanDiT,
    multi_axis_rope,
    wan_lora_targets,
    wan_partition_rules,
    wan_position_ids,
)
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class AudioModel(BaseTpuModel):
    arch = "ace_step_15"
    archs = ["ace_step_15", "ace_step_15_xl", "ace_step"]
    is_flow_matching = True
    bucket_divisibility = 1
    max_txt_len = 256
    is_audio = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.vae_config = AudioVAEConfig.tiny()
            self.t5_config = T5Config.tiny()
            base = WanConfig.tiny()
            self.dit_config = WanConfig(
                **{**base.__dict__, "in_channels": self.vae_config.latent_channels,
                   "patch_size": (1, 1, 1), "axes_dim": (16, 0, 0)}
            )
            self.max_txt_len = 16
        else:
            self.vae_config = AudioVAEConfig.default()
            self.t5_config = T5Config.xxl()
            xl = config.arch.endswith("xl")
            self.dit_config = WanConfig(
                in_channels=self.vae_config.latent_channels,
                dim=2560 if xl else 1536, ffn_dim=10240 if xl else 6144,
                num_heads=20 if xl else 12, num_layers=32 if xl else 24,
                patch_size=(1, 1, 1), axes_dim=(128 if xl else 128, 0, 0),
            )
        self.dit = WanDiT(self.dit_config)
        self.vae = AudioAutoencoderKL(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_t5 = jax.random.split(rng, 3)
        cfg = self.dit_config
        n = 8
        pe = jnp.zeros((1, n, cfg.head_dim // 2, 2, 2))
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n, cfg.in_channels)), jnp.zeros((1, 8, cfg.text_dim)),
            jnp.zeros((1,)), pe, None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 4 * self.vae_config.downscale, self.vae_config.in_channels))
        )
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "t5": t5_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt}

    def rope_table(self, n_tokens: int) -> jnp.ndarray:
        ids = wan_position_ids(n_tokens, 1, 1)
        # only the time axis carries dims; drop zero-dim axes
        dims = [d for d in self.dit_config.axes_dim if d > 0]
        return multi_axis_rope(ids[..., : len(dims)], dims)

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, T_lat, C] audio latents."""
        b, n, c = noisy_latents.shape
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "quant"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, noisy_latents, cond["txt"], t, cond["pe"], None)
        return out

    def encode_audio(self, variables, waveform, rng=None):
        """waveform: [B, T, C] in [-1, 1] -> [B, T/downscale, latent_ch]."""
        return self.vae.apply(
            {"params": variables["vae"]}, waveform, rng, method=AudioAutoencoderKL.encode
        )

    # encode_images alias so the generic caching path works on audio too
    encode_images = encode_audio

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=AudioAutoencoderKL.decode)

    def latent_shape_audio(self, num_samples: int):
        return num_samples // self.vae_config.downscale, self.vae_config.latent_channels

    def lora_targets(self):
        return wan_lora_targets()

    def partition_rules(self):
        return wan_partition_rules(self.dit_config.scan_blocks)
