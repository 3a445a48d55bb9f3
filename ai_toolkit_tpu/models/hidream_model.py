"""HiDream-I1 model family wrapper (hidream / hidream_e1 edit).

Parity target: the reference plugin
``extensions_built_in/diffusion_models/hidream/hidream_model.py`` + vendored
``src/models``: an MMDiT-MoE — 16 joint double-stream blocks + 32
single-stream blocks, hidden 2560 (20 heads x 128), **MoE FFN** in every
block (4 routed SwiGLU experts, top-2, unnormalized gates, plus a half-width
shared expert — ``src/models/moe.py``), RoPE positions, flow matching on
16-ch VAE latents. Conditioning: CLIP-L + CLIP-G pooled projections (2048-d
modulation vector), T5-xxl states and Llama-3.1-8B hidden states as the text
sequence (``hidream_model.py:95-214``).

Simplification noted for parity review: the reference feeds a *different*
Llama layer's states to each block; here the T5 states and the final Llama
states are sequence-concatenated once (one conditioning stream through the
scanned stack). The MoE math follows the reference exactly.

The e1 (edit) variant conditions on a control image via sequence-concat of
its packed latents, like the qwen edit family.
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
from ai_toolkit_tpu.models.text_encoders import (
    CLIPTextConfig,
    CLIPTextModel,
    LLMConfig,
    LLMEncoder,
    T5Config,
    T5Encoder,
)
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class HiDreamModel(BaseTpuModel):
    arch = "hidream"
    archs = ["hidream", "hidream_e1", "hidream_o1"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 128

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.is_edit = config.arch == "hidream_e1"
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__, "depth_double": 1, "depth_single": 1, "guidance_embed": False,
                "moe_experts": 4, "moe_top_k": 2, "qk_norm_across_heads": True,
            })
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.clip2_config = CLIPTextConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.llm_config = LLMConfig.tiny(d_model=64)
            self.max_txt_len = 16
        else:
            # FFN widths follow the reference's SwiGLU rounding exactly
            # (attention.py:86-92): routed = 256*ceil(2/3*4d/256) = 6912,
            # shared = 256*ceil(2/3*2d/256) = 3584 for d=2560
            self.dit_config = FluxConfig(
                in_channels=64, hidden_size=2560, num_heads=20, head_dim=128,
                depth_double=16, depth_single=32, context_dim=4096, vec_dim=2048,
                guidance_embed=False, axes_dim=(16, 56, 56),
                moe_experts=4, moe_top_k=2, mlp_ratio=6912 / 2560,
                moe_shared_hidden=3584, qk_norm_across_heads=True,
                # measured on v5e @ s=4608: dense dispatch 11.7ms fwd (84% MXU,
                # XLA-fused) beats the Pallas grouped GEMM (14.5ms, HBM-bound
                # on weight streaming) and lax.ragged_dot (12.6ms) at E=4/k=2 —
                # the 2x FLOP saving doesn't cover the util gap at this expert
                # count. 'grouped' stays config-selectable for large-E MoEs.
                moe_dispatch=config.model_kwargs.get("moe_dispatch", "dense"),
            )
            self.vae_config = VAEConfig.flux()
            self.clip_config = CLIPTextConfig.clip_l()
            self.clip2_config = CLIPTextConfig.open_clip_g()
            self.t5_config = T5Config.xxl()
            self.llm_config = LLMConfig.llama31_8b()
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.clip2 = CLIPTextModel(self.clip2_config)
        self.t5 = T5Encoder(self.t5_config)
        self.llm = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )
        self.tokenizer_t5 = load_tokenizer(
            config.name_or_path, "tokenizer_3", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )
        self.tokenizer_llm = load_tokenizer(
            config.name_or_path, "tokenizer_4", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r1, r2, r3, r4 = jax.random.split(rng, 6)
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
            "clip": self.clip.init(r1, jnp.zeros((1, 77), jnp.int32))["params"],
            "clip2": self.clip2.init(r2, jnp.zeros((1, 77), jnp.int32))["params"],
            "t5": self.t5.init(r3, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
            "llm": self.llm.init(r4, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_hidream_checkpoint

            return load_hidream_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        cfg = self.dit_config
        ids = jnp.asarray(np.stack([self.tokenizer.encode(p) for p in prompts]))
        t5_ids = jnp.asarray(np.stack([self.tokenizer_t5.encode(p) for p in prompts]))
        llm_ids = jnp.asarray(np.stack([self.tokenizer_llm.encode(p) for p in prompts]))
        o1 = jax.jit(self.clip.apply)({"params": variables["clip"]}, ids)
        o2 = jax.jit(self.clip2.apply)({"params": variables["clip2"]}, ids)
        t5_out = jax.jit(self.t5.apply)({"params": variables["t5"]}, t5_ids)
        llm_out = jax.jit(self.llm.apply)({"params": variables["llm"]}, llm_ids)
        if isinstance(llm_out, dict):
            llm_out = llm_out["last_hidden_state"]

        def fit(x):  # pad/trim feature dim to the DiT context width
            pad = cfg.context_dim - x.shape[-1]
            return jnp.pad(x, ((0, 0), (0, 0), (0, max(pad, 0))))[..., : cfg.context_dim]

        txt = jnp.concatenate([fit(t5_out), fit(llm_out)], axis=1)
        pooled = jnp.concatenate([o1["pooled_output"], o2["pooled_output"]], axis=-1)
        pad_p = cfg.vec_dim - pooled.shape[-1]
        pooled = jnp.pad(pooled, ((0, 0), (0, max(pad_p, 0))))[..., : cfg.vec_dim]
        return {"txt": txt, "y": pooled}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        # e1 conditions by WIDTH-concat of the source-image latents
        # (pipeline_hidream_image_editing.py:1123: cat([input, image_latents],
        # dim=-1)), so the edit grid is simply twice as wide
        w2 = latent_w * 2 if self.is_edit else latent_w
        ids = image_position_ids(latent_h // 2, w2 // 2, text_len=txt_len)
        return multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        full_w = w
        if self.is_edit:
            # side-by-side source image, prediction sliced back to the left
            # half (pipeline_hidream_image_editing.py:1123,1147); the rope
            # table is always built for the widened grid, so a missing
            # control (shouldn't happen in e1 training) pads with zeros
            ctrl = cond.get("control_latents")
            if ctrl is None:
                ctrl = jnp.zeros_like(noisy_latents)
            noisy_latents = jnp.concatenate(
                [noisy_latents, ctrl.astype(noisy_latents.dtype)], axis=2)
            full_w = 2 * w
        img = pack_latents(noisy_latents)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["y"], cond["pe"], None)
        return unpack_latents(out, h, full_w)[:, :, :w]

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
        # attention projections only: MoE expert kernels carry a [E, ...] axis
        # the LoRA builder doesn't stack over (see flux_dit.MoEFFN)
        return [r"double_blocks/.*(qkv|proj)$", r"single_blocks/.*(qkv|proj)$",
                r"double_\d+/.*(qkv|proj)$", r"single_\d+/.*(qkv|proj)$"]

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)
