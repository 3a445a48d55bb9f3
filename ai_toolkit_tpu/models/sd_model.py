"""SD1.x / SD2.x / SDXL model wrappers (eps/v-pred UNet family).

Parity target: the reference's legacy ``StableDiffusion`` monolith
(``/root/reference/toolkit/stable_diffusion_model.py:127``) for the sd1, sd2,
sdxl archs: CLIP conditioning (dual TE + pooled + time_ids for SDXL), 4-ch
VAE, DDPM-family schedules.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import CLIPTextConfig, CLIPTextModel
from ai_toolkit_tpu.models.unet import UNet2DCondition, UNetConfig, unet_lora_targets, unet_partition_rules
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class SDModel(BaseTpuModel):
    arch = "sd1"
    archs = ["sd1", "sd15", "sd2", "ssd", "vega"]
    is_flow_matching = False
    bucket_divisibility = 8

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.unet_config = UNetConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
        else:
            self.unet_config = UNetConfig.sd21() if config.arch == "sd2" else UNetConfig.sd15()
            self.vae_config = VAEConfig.sd()
            self.clip_config = CLIPTextConfig.clip_l()
        if config.remat_policy == "none":
            # measured r4 (v5e @1024 bs1): the UNet step is HBM-bound; remat
            # recompute adds ~10% bytes — no-remat is faster when it fits
            import dataclasses as _dc

            self.unet_config = _dc.replace(self.unet_config, remat=False)
        self.unet = UNet2DCondition(self.unet_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_unet, r_vae, r_clip = jax.random.split(rng, 3)
        d = 8 * 2 ** (len(self.unet_config.block_out_channels) - 1)
        added = None
        if self.unet_config.addition_time_embed_dim:
            pooled_dim = (
                self.unet_config.projection_class_embeddings_dim
                - 6 * self.unet_config.addition_time_embed_dim
            )
            added = {
                "time_ids": jnp.zeros((1, 6), jnp.float32),
                "text_embeds": jnp.zeros((1, pooled_dim), self.unet_config.dtype),
            }
        unet_vars = self.unet.init(
            r_unet,
            jnp.zeros((1, d // 8, d // 8, self.unet_config.in_channels), self.unet_config.dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, self.unet_config.cross_attention_dim), self.unet_config.dtype),
            added,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3)),
        )
        clip_vars = self.clip.init(r_clip, jnp.zeros((1, 77), jnp.int32))
        return {
            "unet": unet_vars["params"],
            "vae": vae_vars["params"],
            "clip": clip_vars["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and os.path.isfile(path):
            # LDM/SGM single file (v1-5-pruned.safetensors, sd_xl_base_1.0,
            # .ckpt) — the dominant sd-family distribution format (reference
            # kohya_model_util.py + keymaps/)
            from ai_toolkit_tpu.io.ldm_single_file import load_ldm_checkpoint

            return load_ldm_checkpoint(path, self)
        if path and os.path.isdir(path):
            from ai_toolkit_tpu.io.sd_import import load_sd_checkpoint

            return load_sd_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        colls = {"params": variables["clip"]}
        if "emb" in variables:  # textual-inversion bank
            colls["emb"] = variables["emb"]
        if "lora_te" in variables:  # trained TE lora at sample time
            colls["lora"] = variables["lora_te"]
        out = jax.jit(self.clip.apply)(colls, jnp.asarray(ids))
        return {"context": out["last_hidden_state"]}

    def predict(self, variables, noisy_latents, t, cond, unet=None):
        collections = {"params": variables["unet"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ip", "ctrl"):
            if k in variables:
                collections[k] = variables[k]
        return (unet or self.unet).apply(
            collections, noisy_latents, t, cond["context"], cond.get("added_cond"),
            cond.get("ip_tokens"), cond.get("adapter_residuals"),
        )

    def enable_free_u(self, s1=0.9, s2=0.2, b1=1.1, b2=1.2):
        """FreeU on the TRAIN forward only (sampling stays plain, mirroring
        the reference's enable/disable dance around sample())."""
        from dataclasses import replace

        self.unet_freeu = UNet2DCondition(replace(self.unet_config, free_u=(b1, b2, s1, s2)))

    def predict_train(self, variables, noisy_latents, t, cond):
        """Train-time forward. When the batch carries token ids (textual
        inversion / TE training), the text encoder runs inside the step so
        grads reach the embedding bank ('emb' collection). IP-Adapter training
        projects clip-vision embeds to ip tokens in-graph (trainable proj)."""
        if "ip_embeds" in cond and "ip_proj" in variables and hasattr(self, "ip_proj"):
            tokens = self.ip_proj.apply({"params": variables["ip_proj"]}, cond["ip_embeds"])
            cond = {**cond, "ip_tokens": tokens}
        if "input_ids" in cond:
            # te_full = trainable full-TE swap (custom adapter 'text_encoder')
            clip_colls = {"params": variables.get("te_full", variables["clip"])}
            if "emb" in variables:
                clip_colls["emb"] = variables["emb"]
            if "lora_te" in variables:  # TE LoRA training (train_text_encoder)
                clip_colls["lora"] = variables["lora_te"]
            out = self.clip.apply(clip_colls, cond["input_ids"])
            cond = {**cond, "context": out["last_hidden_state"]}
        return self.predict(
            variables, noisy_latents, t, cond, unet=getattr(self, "unet_freeu", None)
        )

    def encode_images(self, variables, images, rng=None):
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def lora_targets(self):
        return unet_lora_targets()

    def partition_rules(self):
        return unet_partition_rules()


@register_model
class SDXLModel(SDModel):
    arch = "sdxl"
    archs = ["sdxl"]
    bucket_divisibility = 8

    def __init__(self, config: ModelConfig):
        BaseTpuModel.__init__(self, config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.unet_config = UNetConfig(
                block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(0, 1),
                num_heads=2, cross_attention_dim=128, addition_time_embed_dim=32,
                projection_class_embeddings_dim=64 + 32 * 6, dtype=jnp.float32,
                param_dtype=jnp.float32, remat=False,
            )
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.clip2_config = CLIPTextConfig.tiny()
        else:
            self.unet_config = UNetConfig.sdxl()
            self.vae_config = VAEConfig.sdxl()
            self.clip_config = CLIPTextConfig.clip_l()
            self.clip2_config = CLIPTextConfig.open_clip_g()
        if config.remat_policy == "none":
            import dataclasses as _dc

            self.unet_config = _dc.replace(self.unet_config, remat=False)
        self.unet = UNet2DCondition(self.unet_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.clip2 = CLIPTextModel(self.clip2_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )
        # second-stage refiner UNet (reference load_refiner,
        # stable_diffusion_model.py:1088; predict split :1985-2030)
        self.refiner = None
        if config.refiner_name_or_path:
            rcfg = ModelConfig(arch="sdxl_refiner",
                               name_or_path=config.refiner_name_or_path,
                               model_kwargs={"size": size})
            self._refiner_model = SDXLRefinerModel(rcfg)
            self.refiner_config = self._refiner_model.unet_config
            self.refiner = self._refiner_model.unet

    def init_variables(self, rng: jax.Array) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        out = super().init_variables(r1)
        out["clip2"] = self.clip2.init(r2, jnp.zeros((1, 77), jnp.int32))["params"]
        if self.refiner is not None:
            rc = self.refiner_config
            added = {
                "time_ids": jnp.zeros((1, 5), jnp.float32),
                "text_embeds": jnp.zeros(
                    (1, rc.projection_class_embeddings_dim - rc.addition_time_embed_dim * 5),
                    rc.dtype),
            }
            out["refiner"] = self.refiner.init(
                r3, jnp.zeros((1, 8, 8, rc.in_channels), rc.dtype), jnp.zeros((1,)),
                jnp.zeros((1, 8, rc.cross_attention_dim), rc.dtype), added,
            )["params"]
        return out

    def encode_prompt(
        self, variables: dict, prompts: list[str], prompts_te1: list[str] | None = None
    ) -> dict:
        """SDXL: concat penultimate states of both TEs; pooled from TE2.

        ``prompts_te1`` feeds TE1 (CLIP-L) a different prompt list — the
        short_and_long_captions_encoder_split path where the short caption
        goes to TE1 and the long one to TE2 (reference SDTrainer.py:1528-1532,
        stable_diffusion_model prompt/prompt2)."""
        ids = jnp.asarray(np.stack([self.tokenizer.encode(p) for p in prompts]))
        ids1 = ids if prompts_te1 is None else jnp.asarray(
            np.stack([self.tokenizer.encode(p) for p in prompts_te1])
        )
        c1 = {"params": variables["clip"]}
        if "lora_te1" in variables:
            c1["lora"] = variables["lora_te1"]
        c2 = {"params": variables["clip2"]}
        if "lora_te2" in variables:
            c2["lora"] = variables["lora_te2"]
        o1 = jax.jit(self.clip.apply, static_argnums=2)(c1, ids1, 1)
        o2 = jax.jit(self.clip2.apply, static_argnums=2)(c2, ids, 1)
        context = jnp.concatenate([o1["last_hidden_state"], o2["last_hidden_state"]], axis=-1)
        return {"context": context, "pooled": o2["pooled_output"]}

    def added_cond(self, pooled: jax.Array, height: int, width: int) -> dict:
        b = pooled.shape[0]
        time_ids = jnp.tile(
            jnp.asarray([height, width, 0, 0, height, width], jnp.float32)[None], (b, 1)
        )
        return {"time_ids": time_ids, "text_embeds": pooled}

    def load_variables(self, rng: jax.Array) -> dict:
        out = super().load_variables(rng)
        if self.refiner is not None:
            if "refiner" not in out:
                out["refiner"] = self.init_variables(jax.random.key(0))["refiner"]
            rpath = self.config.refiner_name_or_path
            ud = os.path.join(rpath, "unet")
            if os.path.isdir(ud):
                from ai_toolkit_tpu.io.flux_import import _merge_imported
                from ai_toolkit_tpu.io.sd_import import unet_rules
                from ai_toolkit_tpu.io.torch_import import load_safetensors_dir, torch_to_tree

                flat = load_safetensors_dir(ud)
                tree, _ = torch_to_tree(
                    flat, unet_rules(len(self.refiner_config.block_out_channels)))
                out["refiner"] = _merge_imported(out["refiner"], tree, "refiner unet")
            elif os.path.isfile(rpath):
                # LDM single-file refiner (sd_xl_refiner_1.0.safetensors):
                # take just the UNet component
                from ai_toolkit_tpu.io.flux_import import _merge_imported
                from ai_toolkit_tpu.io.ldm_single_file import (
                    _load_single_file, is_ldm_checkpoint, split_ldm_checkpoint)
                from ai_toolkit_tpu.io.sd_import import unet_rules
                from ai_toolkit_tpu.io.torch_import import torch_to_tree

                flat = _load_single_file(rpath)
                if not is_ldm_checkpoint(flat):
                    raise ValueError(
                        f"refiner_name_or_path '{rpath}': not an LDM "
                        f"single-file checkpoint and not an HF-layout dir")
                comps = split_ldm_checkpoint(
                    flat, self.refiner_config.layers_per_block)
                tree, _ = torch_to_tree(
                    comps.get("unet", {}),
                    unet_rules(len(self.refiner_config.block_out_channels)))
                out["refiner"] = _merge_imported(out["refiner"], tree, "refiner unet")
            else:
                print(f"refiner '{rpath}' not found locally — refiner stays random-init")
        return out

    # static routing flag set by the trainer before tracing:
    #   None -> base unet only; 'all' -> every sample through the refiner
    #   (train_unet false); 'split' -> first half base / second half refiner
    #   (the reference's double-up, stable_diffusion_model.py:1985-2015)
    refiner_mode: str | None = None

    def predict(self, variables, noisy_latents, t, cond, unet=None):
        if self.refiner is None or not self.refiner_mode:
            return super().predict(variables, noisy_latents, t, cond, unet=unet)
        rcolls = {"params": variables["refiner"]}
        if "lora_refiner" in variables:
            rcolls["lora"] = variables["lora_refiner"]
        ctx = cond["context"][..., -self.refiner_config.cross_attention_dim:]
        d = self.vae_config.downscale
        hh, ww = noisy_latents.shape[1] * d, noisy_latents.shape[2] * d
        added_r = self._refiner_model.added_cond(
            cond["added_cond"]["text_embeds"], hh, ww)
        if self.refiner_mode == "all":
            return self.refiner.apply(rcolls, noisy_latents, t, ctx, added_r)
        half = noisy_latents.shape[0] // 2
        base_cond = {**cond,
                     "context": cond["context"][:half],
                     "added_cond": jax.tree.map(lambda x: x[:half], cond["added_cond"])}
        base = super().predict(
            {k: v for k, v in variables.items() if k != "lora_refiner"},
            noisy_latents[:half], t[:half], base_cond, unet=unet)
        ref = self.refiner.apply(
            rcolls, noisy_latents[half:], t[half:], ctx[half:],
            jax.tree.map(lambda x: x[half:], added_r))
        return jnp.concatenate([base, ref], axis=0)

    def predict_train(self, variables, noisy_latents, t, cond):
        """SDXL in-graph dual-TE path (TE LoRA / textual inversion)."""
        if "input_ids" in cond:
            ids = cond["input_ids"]
            c1 = {"params": variables["clip"]}
            if "emb" in variables:
                c1["emb"] = variables["emb"]
            if "lora_te1" in variables:
                c1["lora"] = variables["lora_te1"]
            c2 = {"params": variables["clip2"]}
            if "lora_te2" in variables:
                c2["lora"] = variables["lora_te2"]
            o1 = self.clip.apply(c1, ids, 1)
            o2 = self.clip2.apply(c2, ids, 1)
            context = jnp.concatenate([o1["last_hidden_state"], o2["last_hidden_state"]], axis=-1)
            d = self.vae_config.downscale
            added = self.added_cond(
                o2["pooled_output"], noisy_latents.shape[1] * d, noisy_latents.shape[2] * d
            )
            cond = {**cond, "context": context, "added_cond": added}
        if "ip_embeds" in cond and "ip_proj" in variables and hasattr(self, "ip_proj"):
            tokens = self.ip_proj.apply({"params": variables["ip_proj"]}, cond["ip_embeds"])
            cond = {**cond, "ip_tokens": tokens}
        return self.predict(
            variables, noisy_latents, t, cond, unet=getattr(self, "unet_freeu", None)
        )


@register_model
class SDXLRefinerModel(SDXLModel):
    """SDXL refiner arch.

    Parity target: the reference's refiner support
    (``toolkit/stable_diffusion_model.py`` ``load_refiner:1088`` and the
    ``stable_diffusion_refiner`` keymap): a 4-level UNet (384/768/1536/1536,
    transformer depth 4 on the middle levels), conditioned ONLY on
    OpenCLIP-G penultimate states (1280-d context) with pooled embeds plus
    5-element micro-conds ``[h, w, crop_top, crop_left, aesthetic_score]``
    (projection dim 1280 + 256*5 = 2560).
    """

    arch = "sdxl_refiner"
    archs = ["sdxl_refiner", "ssd_refiner"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            self.unet_config = UNetConfig(
                block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(0, 1),
                num_heads=2, cross_attention_dim=64, addition_time_embed_dim=32,
                projection_class_embeddings_dim=64 + 32 * 5, dtype=jnp.float32,
                param_dtype=jnp.float32, remat=False,
            )
        else:
            self.unet_config = UNetConfig(
                block_out_channels=(384, 768, 1536, 1536),
                layers_per_block=2,
                transformer_layers=(0, 4, 4, 0),
                cross_attention_dim=1280,
                head_dim=64,  # 12 heads @768, 24 @1536 (sd2+ lineage)
                addition_time_embed_dim=256,
                projection_class_embeddings_dim=2560,
            )
        self.unet = UNet2DCondition(self.unet_config)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        """Refiner uses only the OpenCLIP-G tower."""
        ids = jnp.asarray(np.stack([self.tokenizer.encode(p) for p in prompts]))
        o2 = jax.jit(self.clip2.apply, static_argnums=2)({"params": variables["clip2"]}, ids, 1)
        return {"context": o2["last_hidden_state"], "pooled": o2["pooled_output"]}

    def added_cond(self, pooled: jax.Array, height: int, width: int,
                   aesthetic_score: float = 6.0) -> dict:
        b = pooled.shape[0]
        time_ids = jnp.tile(
            jnp.asarray([height, width, 0, 0, aesthetic_score], jnp.float32)[None], (b, 1)
        )
        return {"time_ids": time_ids, "text_embeds": pooled}
