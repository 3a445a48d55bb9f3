"""Qwen-Image model family (qwen_image / qwen_image_edit / qwen_image_edit_plus).

Parity target: the reference plugin
``extensions_built_in/diffusion_models/qwen_image/qwen_image.py`` — a 60-layer
dual-stream MMDiT (diffusers ``QwenImageTransformer2DModel``): hidden 3072,
24 heads x 128, joint text+image attention every layer (no single-stream
stage), modulation from the timestep only (no pooled text vector, no guidance
embed), text conditioning from Qwen2.5-VL hidden states (3584-d) with an
attention mask over padded tokens, 16-ch VAE latents packed 2x2, flow matching
with dynamic shift, loss target = noise - latents
(``qwen_image.py:408-411``). Edit variants condition on a control image whose
packed latents are concatenated along the *sequence* axis
(``qwen_image_edit.py:61-62`` encodes the control into the joint stream);
the output is sliced back to the image tokens.

TPU design: reuses FluxDiT with depth_single=0 — joint blocks are flux double
blocks; the timestep-only modulation is expressed by passing a zero pooled
vector (the vector MLP then contributes a learned constant, numerically a
bias). LoRA save/load uses the reference's ComfyUI convention
(``transformer.`` -> ``diffusion_model.``, ``qwen_image.py:420-433``).
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
class QwenImageModel(BaseTpuModel):
    arch = "qwen_image"
    archs = ["qwen_image", "qwen_image_edit", "qwen_image_edit_plus",
             "mageflow", "mageflow_edit"]
    is_flow_matching = True
    bucket_divisibility = 32  # 16 VAE * 2 patch (reference get_bucket_divisibility)
    max_txt_len = 256

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.is_edit = config.arch in (
            "qwen_image_edit", "qwen_image_edit_plus", "mageflow_edit"
        )
        # edit_plus: a LIST of reference images per item, each sequence-
        # concatenated with its own frame index (reference
        # qwen_image_edit_plus.py:68 has_multiple_control_images +
        # get_noise_prediction img_shapes accumulation :262-338)
        self.multi_control = config.arch == "qwen_image_edit_plus"
        self.is_mageflow = (config.arch or "").startswith("mageflow")
        size = config.model_kwargs.get("size", "full")
        self._vae_3d = False
        self._vae_mage = False
        if size == "tiny":
            base = FluxConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__, "depth_double": 2, "depth_single": 0, "guidance_embed": False,
                # mageflow: one token per latent pixel (patch 1), no 2x2 pack
                **({"in_channels": self.vae_config.latent_channels}
                   if self.is_mageflow else {}),
            })
            self.llm_config = LLMConfig.tiny()
            self.max_txt_len = 16
        elif self.is_mageflow:
            # MageFlow NR-MMDiT (reference extensions_built_in/diffusion_models/
            # mageflow/src/transformer.py:485-727): qwen-image block structure
            # (joint to_q/add_q_proj attention, 6-way img/txt mod, gelu-approx
            # MLPs), dims from the checkpoint's transformer/config.json.
            # ONE TOKEN PER LATENT PIXEL (patch_size 1, mageflow.py:122-125) —
            # no 2x2 packing. VAE is the exact MageVAE (models/mage_vae.py,
            # DiCo encoder + CoD/NeRF decoder, 128-ch/16x); TE is Qwen3-VL
            # (hidden 2560, final hidden states — src/text_encoder.py).
            d = self._mageflow_config_json()
            hd = d.get("hidden_size", 3072)
            heads = d.get("num_heads", 24)
            self.dit_config = FluxConfig(
                in_channels=d.get("in_channels", 128), hidden_size=hd,
                num_heads=heads, head_dim=hd // heads,
                depth_double=d.get("depth", 32), depth_single=0,
                context_dim=d.get("context_in_dim", 2560), vec_dim=256,
                guidance_embed=False,
                axes_dim=tuple(d.get("axes_dim", (16, 56, 56))),
            )
            from ai_toolkit_tpu.models.mage_vae import MageVAEConfig

            self.vae_config = (
                MageVAEConfig.tiny() if config.model_kwargs.get("vae_size") == "tiny"
                else MageVAEConfig()
            )
            if config.model_kwargs.get("te_size") == "tiny":
                self.llm_config = LLMConfig.tiny(qk_head_norm=True)
            else:
                te = self._te_config_json()
                base = LLMConfig.qwen3_2b()
                self.llm_config = LLMConfig(
                    vocab_size=te.get("vocab_size", base.vocab_size),
                    d_model=te.get("hidden_size", 2560),
                    n_layers=te.get("num_hidden_layers", 36),
                    n_heads=te.get("num_attention_heads", 32),
                    n_kv_heads=te.get("num_key_value_heads", 8),
                    head_dim=te.get("head_dim", 128),
                    d_ff=te.get("intermediate_size", 9728),
                    rope_theta=float(te.get("rope_theta", base.rope_theta)),
                    rms_eps=float(te.get("rms_norm_eps", base.rms_eps)),
                    qk_head_norm=True,
                )
        else:
            self.dit_config = FluxConfig(
                in_channels=64, hidden_size=3072, num_heads=24, head_dim=128,
                depth_double=60, depth_single=0, context_dim=3584, vec_dim=256,
                guidance_embed=False, axes_dim=(16, 56, 56),
            )
            # qwen's VAE is the wan 2.1 causal VAE applied at T=1
            # (diffusers AutoencoderKLQwenImage) — exact import supported
            from ai_toolkit_tpu.models.wan_vae import WanVAEConfig

            self.vae_config = WanVAEConfig.wan21()
            self._vae_3d = True
            self.llm_config = LLMConfig.qwen25_7b()
        self.dit = FluxDiT(self.dit_config)
        if self._vae_3d:
            from ai_toolkit_tpu.models.wan_vae import WanVAE

            self.vae = WanVAE(self.vae_config)
        elif self.is_mageflow and size != "tiny":
            from ai_toolkit_tpu.models.mage_vae import MageVAE

            self.vae = MageVAE(self.vae_config)
            self._vae_mage = True
        else:
            self.vae = AutoencoderKL(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=self.max_txt_len,
        )

    def _mageflow_config_json(self) -> dict:
        import json
        import os

        p = os.path.join(self.config.name_or_path or "", "transformer", "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                return {**json.load(f), **self.config.model_kwargs.get("transformer_config", {})}
        return dict(self.config.model_kwargs.get("transformer_config", {}))

    def _te_config_json(self) -> dict:
        import json
        import os

        p = os.path.join(self.config.name_or_path or "", "text_encoder", "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                d = json.load(f)
            return d.get("text_config", d)
        return dict(self.config.model_kwargs.get("text_encoder_config", {}))

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
            None,
        )
        sd_ = self.vae_config.spatial_downscale if self._vae_3d else self.vae_config.downscale
        shape = ((1, 1, 2 * sd_, 2 * sd_, 3) if self._vae_3d
                 else (1, 2 * sd_, 2 * sd_, 3))
        vae_vars = self.vae.init(r_vae, jnp.zeros(shape))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "vae": vae_vars["params"], "te": te_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and os.path.isdir(os.path.join(path, "transformer")):
            from ai_toolkit_tpu.io.qwen_import import load_qwen_checkpoint

            return load_qwen_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        # valid = everything up to and including the first eos (rest is pad)
        is_eos = ids == self.tokenizer.eos_id
        mask = (np.cumsum(is_eos, axis=1) - is_eos <= 0).astype(np.int32)
        txt = jax.jit(self.te.apply)(
            {"params": variables["te"]}, jnp.asarray(ids), jnp.asarray(mask)
        )
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim)),
                "txt_mask": jnp.asarray(mask, bool)}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        # mageflow: one token per latent pixel, so the rope grid is the FULL
        # latent grid; qwen-image packs 2x2 so the grid is halved
        gh = latent_h if self.is_mageflow else latent_h // 2
        gw = latent_w if self.is_mageflow else latent_w // 2
        ids = image_position_ids(gh, gw, text_len=txt_len)
        table = multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )
        if self.is_edit:
            # control tokens reuse the image grid shifted on the frame axis
            # (edit image is "frame 1"; edit_plus gives each reference image
            # its own frame index — img_shapes entry i -> frame i)
            n_ctrl = int(getattr(self, "_n_ctrl", 1)) if self.multi_control else 1
            tables = [table]
            for i in range(n_ctrl):
                cids = np.asarray(image_position_ids(gh, gw, text_len=0)).copy()
                cids[:, 0] = i + 1  # frame index axis
                tables.append(multi_axis_rope(
                    jnp.asarray(cids)[None], list(self.dit_config.axes_dim),
                    self.dit_config.theta,
                ))
            table = jnp.concatenate(tables, axis=1)
        return table

    def predict(self, variables, noisy_latents, t, cond):
        """cond: txt, y, pe, optional txt_mask, optional control_latents
        [B, h, w, C] sequence-concatenated for edit archs."""
        b, h, w, c = noisy_latents.shape
        if self.is_mageflow:
            # one token per latent pixel (patch_size 1, mageflow.py:122-125)
            img = noisy_latents.reshape(b, h * w, c)
        else:
            img = pack_latents_cmajor(noisy_latents)
        n_img = img.shape[1]
        img_mask = None
        if self.is_edit and cond.get("control_latents") is not None:
            ctrl = cond["control_latents"]
            ctrls = (
                [ctrl[:, i] for i in range(ctrl.shape[1])] if ctrl.ndim == 5
                else [ctrl]
            )  # edit_plus: [B, N, h, w, C] — one packed block per reference
            for ct in ctrls:
                ct = (ct.reshape(b, -1, c) if self.is_mageflow
                      else pack_latents_cmajor(ct))
                img = jnp.concatenate([img, ct], axis=1)
            counts = cond.get("ctrl_counts")
            if counts is not None and len(ctrls) > 1:
                # mixed per-item reference counts: padded slots are attention-
                # invisible (loader zero-pads to a static N; the reference
                # instead varies img_shapes per item — same effect)
                n_tok = (img.shape[1] - n_img) // len(ctrls)
                slot = jnp.repeat(jnp.arange(len(ctrls)), n_tok)  # [N_ctrl_tok]
                ok = slot[None, :] < counts[:, None]  # [B, N_ctrl_tok]
                img_mask = jnp.concatenate(
                    [jnp.ones((b, n_img), bool), ok], axis=1
                )
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        txt_mask = cond.get("txt_mask")
        out = self.dit.apply(
            colls, img, cond["txt"], t, cond["y"], cond["pe"], None, txt_mask,
            img_mask=img_mask,
        )
        if self.is_mageflow:
            return out[:, :n_img].reshape(b, h, w, c)
        return unpack_latents_cmajor(out[:, :n_img], h, w)

    def encode_images(self, variables, images, rng=None):
        if self._vae_3d:
            from ai_toolkit_tpu.models.wan_vae import WanVAE

            lat = self.vae.apply(
                {"params": variables["vae"]}, images[:, None], rng, method=WanVAE.encode
            )
            return lat[:, 0]
        if self._vae_mage:
            from ai_toolkit_tpu.models.mage_vae import MageVAE

            return self.vae.apply(
                {"params": variables["vae"]}, images, rng, method=MageVAE.encode
            )
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        if self._vae_3d:
            from ai_toolkit_tpu.models.wan_vae import WanVAE

            out = self.vae.apply(
                {"params": variables["vae"]}, latents[:, None], method=WanVAE.decode
            )
            return out[:, 0]
        if self._vae_mage:
            from ai_toolkit_tpu.models.mage_vae import MageVAE

            return self.vae.apply(
                {"params": variables["vae"]}, latents, method=MageVAE.decode
            )
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.spatial_downscale if self._vae_3d else self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        if self.is_mageflow:
            return h * w
        return (h // 2) * (w // 2)

    def lora_targets(self):
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)

    def lora_key_layout(self) -> str:
        return "comfy"
