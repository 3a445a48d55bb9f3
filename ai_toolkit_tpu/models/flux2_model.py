"""FLUX.2 model family wrapper (flux2 / flux2_klein_9b / flux2_klein_4b).

Parity target: the reference plugin
``extensions_built_in/diffusion_models/flux2/`` (param tables
``src/model.py:9-48``, wrapper ``flux2_model.py``): double+single stream
rectified-flow DiT with **mlp_ratio 3.0, rope theta 2000, 4-axis rope
(32,32,32,32)**, 32-ch VAE latents packed 2x2 (in_channels 128), modulation
from the timestep (+ guidance embed on the 32B base; klein variants are
guidance-free), and text conditioning from a **Mistral-Small** decoder: three
hidden-state layers concatenated feature-wise (context_in_dim = 3 x d_model:
15360 / 12288 / 7680).

| arch            | hidden | heads | double | single | context |
|------------------|--------|-------|--------|--------|---------|
| flux2 (32B)      | 6144   | 48    | 8      | 48     | 15360   |
| flux2_klein_9b   | 4096   | 32    | 8      | 24     | 12288   |
| flux2_klein_4b   | 3072   | 24    | 5      | 20     | 7680    |

LoRA export uses the ComfyUI ``diffusion_model.`` convention
(``flux2_model.py:508-521``).
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

_FLUX2_DIMS = {
    # arch: (hidden, heads, depth_double, depth_single, context, guidance)
    "flux2": (6144, 48, 8, 48, 15360, True),
    "flux2_klein_9b": (4096, 32, 8, 24, 12288, False),
    "flux2_klein_4b": (3072, 24, 5, 20, 7680, False),
}


@register_model
class Flux2Model(BaseTpuModel):
    arch = "flux2"
    archs = ["flux2", "flux2_klein_9b", "flux2_klein_4b"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512
    # Mistral layers concatenated feature-wise for conditioning
    te_collect_layers = 3

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__, "mlp_ratio": 3.0, "theta": 2000.0,
                "axes_dim": (4, 4, 4, 4), "context_dim": 2 * 64,
                "gated_mlp": True,
            })
            self.vae_config = VAEConfig.tiny()
            self.llm_config = LLMConfig.tiny(collect_layers=(0, 1))
            self._n_collect = 2
            self.max_txt_len = 16
        else:
            h, nh, dd, ds, ctx, guid = _FLUX2_DIMS[config.arch]
            self.dit_config = FluxConfig(
                in_channels=128, hidden_size=h, num_heads=nh, head_dim=128,
                depth_double=dd, depth_single=ds, context_dim=ctx, vec_dim=256,
                mlp_ratio=3.0, theta=2000.0, axes_dim=(32, 32, 32, 32),
                guidance_embed=guid, gated_mlp=True,
            )
            # FLUX.2 uses a 32-ch VAE (packed 2x2 -> 128 in_channels)
            self.vae_config = VAEConfig(
                latent_channels=32, scaling_factor=1.0, use_quant_conv=False
            )
            d_model = ctx // self.te_collect_layers
            self.llm_config = LLMConfig(
                vocab_size=131_072, d_model=d_model,
                n_layers=40, n_heads=32, n_kv_heads=8,
                head_dim=d_model // 32, d_ff=4 * d_model,
                rope_theta=1_000_000.0,
                collect_layers=(9, 19, 29),
            )
            self._n_collect = 3
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
        dit_vars = self.dit.init(
            r_dit,
            jnp.zeros((1, n_img, cfg.in_channels), cfg.dtype),
            jnp.zeros((1, n_txt, cfg.context_dim), cfg.dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.vec_dim)),
            pe,
            jnp.zeros((1,)) if cfg.guidance_embed else None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and os.path.exists(path):
            from ai_toolkit_tpu.io.dit_importers import load_flux2_checkpoint

            return load_flux2_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        out = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        # concat the collected hidden layers on the feature dim
        # (flux2 context_in_dim = n_layers * d_model)
        col = out["collected"]  # [L, B, S, D]
        txt = jnp.concatenate([col[i] for i in range(col.shape[0])], axis=-1)
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim)),
                "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids3 = np.asarray(image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len))
        # 4-axis rope: (batch/frame, t, y, x); axis 0 stays zero for images
        ids4 = np.concatenate([np.zeros((ids3.shape[0], 1), np.int32), ids3], axis=1)
        return multi_axis_rope(
            jnp.asarray(ids4)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents_cmajor(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(
            colls, img, cond["txt"], t, cond["y"], cond["pe"],
            cond.get("guidance") if self.dit_config.guidance_embed else None,
            cond.get("txt_mask"),
        )
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

    def lora_key_layout(self) -> str:
        # flux2_model.py:508-521: transformer. -> diffusion_model. for ComfyUI
        return "comfy"
