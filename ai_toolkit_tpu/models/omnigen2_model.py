"""OmniGen2 model wrapper — exact.

Parity target: the reference plugin
``extensions_built_in/diffusion_models/omnigen2/`` — a Qwen2.5-VL(-3B)
multimodal LLM provides conditioning hidden states (2048-d, chat-templated
prompts, pipeline_omnigen2.py:335-344), and the vendored
OmniGen2Transformer2DModel (exact flax port: ``models/omnigen2_dit.py``)
denoises FLUX-VAE latents. Reference/edit images are VAE-encoded and fed as
separate in-context streams with a dedicated patch embedder + refiner and
per-image index embeddings.

Timestep convention (omnigen2/__init__.py:241-247): the model receives
``1 - t`` and the loss target is ``latents - noise`` — i.e. the raw
prediction is the NEGATED flow velocity, so predict() negates it back.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.flux_dit import pack_latents, unpack_latents
from ai_toolkit_tpu.models.omnigen2_dit import (
    OmniGen2Config,
    OmniGen2DiT,
    omnigen2_lora_targets,
    omnigen2_partition_rules,
    omnigen2_pos_angles,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

# pipeline_omnigen2.py:335-343 (Qwen2 chat template, add_generation_prompt
# False)
_CHAT_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant that generates "
    "high-quality images based on user instructions.<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n"
)


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
            self.dit_config = OmniGen2Config.tiny()
            self.vae_config = VAEConfig.tiny()
            self.llm_config = LLMConfig.tiny(d_model=self.dit_config.cap_feat_dim)
            self.max_txt_len = 16
        else:
            self.dit_config = OmniGen2Config.from_hf(self._dit_config_json())
            self.vae_config = VAEConfig.flux()
            # Qwen2.5-VL-3B text tower
            self.llm_config = LLMConfig(
                vocab_size=151_936, d_model=2048, n_layers=36, n_heads=16, n_kv_heads=2,
                head_dim=128, d_ff=11008, rope_theta=1_000_000.0, qkv_bias=True,
                rms_eps=1e-6,
            )
        self.dit = OmniGen2DiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=151_643 if size != "tiny" else 2, max_len=self.max_txt_len,
        )

    def _dit_config_json(self) -> dict:
        p = os.path.join(self.config.name_or_path or "", "transformer", "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                return {**json.load(f), **self.config.model_kwargs.get("transformer_config", {})}
        return dict(self.config.model_kwargs.get("transformer_config", {}))

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        n_txt, hp, wp = 8, 4, 4
        ppc = cfg.patch_size**2 * cfg.in_channels
        ca, ia, ra = omnigen2_pos_angles(
            cfg, hp, wp, jnp.full((1,), n_txt), n_txt, ref_hw=(hp, wp), n_ref=1)
        dit_vars = self.dit.init(
            r_dit,
            jnp.zeros((1, hp * wp, ppc)),
            jnp.zeros((1, n_txt, cfg.cap_feat_dim)),
            jnp.zeros((1,)), jnp.ones((1, n_txt), bool), ia, ca,
            jnp.zeros((1, 1, hp * wp, ppc)), ra,
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
        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_omnigen2_checkpoint

            return load_omnigen2_checkpoint(path, self)
        if path:
            self.refuse_bad_layout("an HF dir with a transformer/ subdir, or a single .safetensors file")
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        prompts = [_CHAT_TEMPLATE.format(p) for p in prompts]
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
        cfg = self.dit_config
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
        refs = ref_ang = None
        ctrl = cond.get("control_latents")
        if ctrl is not None:
            if ctrl.ndim == 4:  # single reference image -> [B, 1, ...]
                ctrl = ctrl[:, None]
            n_ref, ch, cw = ctrl.shape[1], ctrl.shape[2], ctrl.shape[3]
            refs = jax.vmap(pack_latents, in_axes=1, out_axes=1)(ctrl)
            ca, ia, ref_ang = omnigen2_pos_angles(
                cfg, h // 2, w // 2, cap_lens, txt.shape[1],
                ref_hw=(ch // 2, cw // 2), n_ref=n_ref)
        else:
            ca, ia, _ = omnigen2_pos_angles(cfg, h // 2, w // 2, cap_lens, txt.shape[1])
        # t reversed; raw prediction is the negated velocity
        # (omnigen2/__init__.py:241-247, get_loss_target latents - noise)
        out = self.dit.apply(colls, img, txt, 1.0 - t, mask, ia, ca, refs, ref_ang)
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
        targets = omnigen2_lora_targets()
        # reference get_transformer_block_names: ref_image_refiner is opt-in
        # via model_kwargs use_image_refiner (omnigen2/__init__.py:341-345)
        if self.config.model_kwargs.get("use_image_refiner", False):
            targets = targets + [r"ref_refiner_\d+/"]
        return targets

    def partition_rules(self):
        return omnigen2_partition_rules(self.dit_config.scan_blocks)

    def lora_key_layout(self) -> str:
        # reference convert_lora_weights_before_save: transformer. ->
        # diffusion_model. (comfy layout)
        return "comfy"
