"""FLUX model family wrapper: DiT + VAE + CLIP/T5 conditioning.

Parity target: the reference's flux arch
(``/root/reference/toolkit/stable_diffusion_model.py`` is_flux path and the
flux plugin models): flow matching, dynamic shift, guidance embedding, T5+CLIP
dual conditioning, 16-ch VAE with packing.
"""

from __future__ import annotations

import os
from functools import cached_property

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
from ai_toolkit_tpu.models.text_encoders import CLIPTextConfig, CLIPTextModel, T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class FluxModel(BaseTpuModel):
    arch = "flux"
    archs = ["flux", "flex1", "flex2", "flux_schnell", "flux_kontext", "chroma"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "dev")
        if size == "tiny":
            self.dit_config = FluxConfig.tiny()
            self.vae_config = VAEConfig.tiny()
            self.clip_config = CLIPTextConfig.tiny()
            self.t5_config = T5Config.tiny()
            self.max_txt_len = 16
        elif size == "bench_2b":
            self.dit_config = FluxConfig.bench_2b()
            self.vae_config = VAEConfig.flux()
            self.clip_config = CLIPTextConfig.clip_l()
            self.t5_config = T5Config.xxl()
        else:
            self.dit_config = (
                FluxConfig.schnell() if config.arch == "flux_schnell" else FluxConfig.dev()
            )
            self.vae_config = VAEConfig.flux()
            self.clip_config = CLIPTextConfig.clip_l()
            self.t5_config = T5Config.xxl()
        if config.arch == "flux_schnell":
            self.dit_config = FluxConfig(**{**self.dit_config.__dict__, "guidance_embed": False})
        if config.arch == "chroma":
            # chroma prunes time_in/vector_in/guidance_in: ALL modulation
            # vectors come from the distilled-guidance Approximator
            # (reference chroma/src/model.py:118; approximator 64->5120x5)
            size = config.model_kwargs.get("size", "full")
            self.dit_config = FluxConfig(**{
                **self.dit_config.__dict__, "guidance_embed": False, "chroma_mod": True,
                "approximator_hidden": 64 if size == "tiny" else 5120,
                "approximator_depth": 2 if size == "tiny" else 5,
            })
        if config.arch == "flex2":
            # flex2 input layout (reference flex2/pipeline.py:282-290, packed):
            # [noisy(64), inpaint latent(64) + keep-mask(4), control(64)] = 196
            base_in = self.dit_config.in_channels
            self.dit_config = FluxConfig(**{
                **self.dit_config.__dict__,
                "in_channels": base_in * 3 + 4,
                "out_channels": base_in,
                "control_channels": base_in * 2 + 4,
            })
        elif config.model_kwargs.get("control") or config.arch == "flux_kontext":
            # control/edit conditioning: packed control latents concat to img tokens
            base_in = self.dit_config.in_channels
            self.dit_config = FluxConfig(**{
                **self.dit_config.__dict__,
                "in_channels": base_in * 2,
                "out_channels": base_in,
                "control_channels": base_in,
            })
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPTextModel(self.clip_config)
        self.t5 = T5Encoder(self.t5_config)
        self.tokenizer_clip = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.clip_config.vocab_size,
            eos_id=self.clip_config.eos_token_id, max_len=77,
        )
        self.tokenizer_t5 = load_tokenizer(
            config.name_or_path, "tokenizer_2", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    # ---- construction ----

    def init_variables(self, rng: jax.Array) -> dict:
        """Random init of all components at tiny cost via jit-eval_shape... (real init)."""
        r_dit, r_vae, r_clip, r_t5 = jax.random.split(rng, 4)
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
            jnp.zeros((1,)),
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3)),
        )
        clip_vars = self.clip.init(r_clip, jnp.zeros((1, 77), jnp.int32))
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "clip": clip_vars["params"],
            "t5": t5_vars["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path and os.path.isdir(path):
            from ai_toolkit_tpu.io.flux_import import load_flux_checkpoint

            return load_flux_checkpoint(path, self)
        return self.init_variables(rng)

    # ---- conditioning ----

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        clip_ids = np.stack([self.tokenizer_clip.encode(p) for p in prompts])
        t5_ids = np.stack([self.tokenizer_t5.encode(p) for p in prompts])
        clip_out = jax.jit(self.clip.apply)({"params": variables["clip"]}, jnp.asarray(clip_ids))
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(t5_ids))
        out = {"txt": txt, "y": clip_out["pooled_output"]}
        if self.config.attn_masking:
            # non-padding = everything up to and including the first eos
            ids = np.asarray(t5_ids)
            is_eos = ids == 1
            out["txt_mask"] = jnp.asarray(np.cumsum(is_eos, axis=1) - is_eos <= 0)
        return out

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids = image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len)
        return multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    # ---- forward ----

    def predict(self, variables: dict, noisy_latents: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        """noisy_latents: [B, h, w, C] (VAE latent space). cond: txt, y, pe, guidance,
        optional control_latents [B, h, w, C_ctrl] (channel-concat conditioning)."""
        b, h, w, c = noisy_latents.shape
        img = pack_latents_cmajor(noisy_latents)
        if cond.get("control_latents") is not None:
            img = jnp.concatenate([img, pack_latents_cmajor(cond["control_latents"])], axis=-1)
        pe = cond["pe"]
        ip_tokens = cond.get("ip_tokens")
        if (ip_tokens is None and "ip_embeds" in cond and "ip_proj" in variables
                and hasattr(self, "ip_proj")):
            # IP-Adapter flux (reference ip_adapter.py:494-556): resampler
            # tokens feed the per-block decoupled-KV attention
            ip_tokens = self.ip_proj.apply({"params": variables["ip_proj"]},
                                           cond["ip_embeds"])
        out = self.dit.apply(
            {"params": variables["dit"], **{k: v for k, v in variables.items() if k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl", "ip")}},
            img,
            cond["txt"],
            t,
            cond["y"],
            pe,
            cond.get("guidance"),
            cond.get("txt_mask"),
            ip_tokens=ip_tokens,
        )
        return unpack_latents_cmajor(out, h, w)

    def encode_images(self, variables: dict, images: jax.Array, rng=None) -> jax.Array:
        if getattr(self, "subpixel_factor", 0):
            # pixel-shuffle "VAE" (reference pixel_shuffle_encoder.py:
            # AutoencoderPixelMixer + stable_diffusion_model.py:2552-2556:
            # latents = scaling * (unshuffle(x) - shift))
            x = _space_to_depth(images, self.subpixel_factor)
            return (x - self._subpixel_shift) * self._subpixel_scale
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables: dict, latents: jax.Array) -> jax.Array:
        if getattr(self, "subpixel_factor", 0):
            x = latents / self._subpixel_scale + self._subpixel_shift
            return _depth_to_space(x, self.subpixel_factor)
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def enable_subpixel(self, rng: jax.Array, downscale_factor: int = 8) -> dict:
        """Subpixel adapter mode (reference toolkit/models/subpixel_adapter.py
        + pixel_shuffle_encoder.py): the VAE becomes a parameterless pixel
        unshuffle with the reference's normalization constants, and the DiT's
        img_in/final_proj swap for fresh projections sized for the new packed
        channel count (768 for f=8, 3072 for f=16 — subpixel_adapter.py:223-231).
        Returns the fresh trainable {img_in, final_proj} overlay for the frozen
        'dit' tree (the reference hijacks x_embedder/proj_out forwards)."""
        import dataclasses

        f = int(downscale_factor)
        if f not in (8, 16):
            raise ValueError(f"subpixel downscale_factor {f} not supported (8 or 16)")
        self.subpixel_factor = f
        # reference AutoencoderPixelMixer Config (pixel_shuffle_encoder.py:45-46)
        self._subpixel_shift = -0.123
        self._subpixel_scale = 1.8
        ch = 3 * f * f  # latent channels after unshuffle
        packed = 4 * ch  # flux packs 2x2 patches channel-major
        self.dit_config = dataclasses.replace(
            self.dit_config, in_channels=packed, out_channels=packed
        )
        self.dit = type(self.dit)(self.dit_config)
        h = self.dit_config.hidden_size
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        lim_in = 1.0 / float(np.sqrt(packed))
        lim_out = 1.0 / float(np.sqrt(h))
        return {
            "img_in": {
                "kernel": jax.random.uniform(k1, (packed, h), jnp.float32, -lim_in, lim_in),
                "bias": jax.random.uniform(k2, (h,), jnp.float32, -lim_in, lim_in),
            },
            "final_proj": {
                "kernel": jax.random.uniform(k3, (h, packed), jnp.float32, -lim_out, lim_out),
                "bias": jax.random.uniform(k4, (packed,), jnp.float32, -lim_out, lim_out),
            },
        }

    # ---- geometry / wiring ----

    def latent_shape(self, height: int, width: int) -> tuple[int, int, int]:
        f = getattr(self, "subpixel_factor", 0)
        if f:
            return height // f, width // f, 3 * f * f
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return (h // 2) * (w // 2)

    def lora_targets(self) -> list[str]:
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)

    # ---- flex2 conditioning (reference extensions_built_in/flex2) ----

    def assemble_flex2_control(
        self,
        latents: np.ndarray,  # clean latents [B, h, w, C]
        keep_mask_px: np.ndarray | None,  # pixel-res keep mask [B, H, W, 1]
        ctrl_latents: np.ndarray | None,  # [B, h, w, C] or None
        host_rng,
    ) -> np.ndarray:
        """Train-time flex2 control tensor [B, h, w, 2C+1]:
        [masked clean latents, inpaint mask (1 = inpaint), control latents]
        with per-batch dropouts/randomization (flex2.condition_noisy_latents).
        Host-side numpy — runs in the loader thread, not the jit graph."""
        mk = self.config.model_kwargs
        b, h, w, c = latents.shape
        lat = np.asarray(latents, np.float32)

        keep = None
        if keep_mask_px is not None:
            import cv2

            keep = np.stack([
                cv2.resize(m[..., 0], (w, h), interpolation=cv2.INTER_LINEAR)
                for m in np.asarray(keep_mask_px, np.float32)
            ])[..., None]
        if float(mk.get("inpaint_random_chance", 0.0)) > 0.0:
            if host_rng.random() < float(mk["inpaint_random_chance"]):
                keep = None
        do_dropout = host_rng.random() < float(mk.get("inpaint_dropout", 0.0))
        if keep is None and not do_dropout and mk.get("do_random_inpainting"):
            keep = 1.0 - _random_blob_mask(b, h, w, host_rng)
        if keep is not None and not do_dropout:
            if mk.get("random_blur_mask") and host_rng.random() < 0.5:
                import cv2

                k = int(host_rng.integers(3, 8))
                k += 1 - k % 2
                keep = np.stack([
                    cv2.blur(m[..., 0], (k, k)) for m in keep
                ])[..., None]
            if float(mk.get("invert_inpaint_mask_chance", 0.0)) > 0.0:
                if host_rng.random() < float(mk["invert_inpaint_mask_chance"]):
                    keep = 1.0 - keep
            inpaint_lat = lat * keep
            if mk.get("random_dialate_mask"):
                import cv2

                px = max(1, int(0.05 * host_rng.random() * min(h, w)))
                kern = np.ones((px, px), np.uint8)
                keep = np.stack([
                    cv2.dilate(m[..., 0], kern) for m in keep
                ])[..., None]
            mask_chan = 1.0 - keep
        else:
            inpaint_lat = np.zeros_like(lat)
            mask_chan = np.ones((b, h, w, 1), np.float32)

        ctrl = np.zeros_like(lat)
        if ctrl_latents is not None:
            if not (host_rng.random() < float(mk.get("control_dropout", 0.0))):
                ctrl = np.asarray(ctrl_latents, np.float32)
        return np.concatenate([inpaint_lat, mask_chan, ctrl], axis=-1)

    def sampling_control_latents(
        self, variables: dict, h: int, w: int, ctrl_img: str | None, gen_width: int, gen_height: int
    ):
        """Inference-time control latents. Non-flex2 control archs get the
        encoded control image (or zeros); flex2 gets the
        [inpaint, mask=1, control] blank layout with the provided image in
        the control slot — or the inpaint slot when the filename carries
        '.inpaint.' with an RGBA keep-alpha (reference pipeline.py:180-290)."""
        import jax.numpy as jnp

        c = self.vae_config.latent_channels
        if getattr(self, "control_lora_inpaint", False):
            # control_lora inpainting layout [masked latents, mask] — an
            # '.inpaint.' RGBA keeps the alpha area, else inpaint everything
            inpaint = jnp.zeros((1, h, w, c), jnp.float32)
            mask = jnp.ones((1, h, w, 1), jnp.float32)
            if ctrl_img:
                from PIL import Image

                im = Image.open(ctrl_img)
                if im.mode == "RGBA":
                    im = im.resize((gen_width, gen_height))
                    keep = np.asarray(im.split()[-1], np.float32)[None, ..., None] / 255.0
                    rgb = np.asarray(im.convert("RGB"), np.float32) / 127.5 - 1.0
                    lat = self.encode_images(variables, jnp.asarray(rgb)[None])
                    import cv2

                    keep_l = cv2.resize(keep[0, ..., 0], (w, h))[None, ..., None]
                    inpaint = lat * jnp.asarray(keep_l)
                    mask = jnp.asarray(1.0 - keep_l, jnp.float32)
            return jnp.concatenate([inpaint, mask], axis=-1)
        if self.config.arch != "flex2":
            # control_lora with num_control_images > 1 expects a wider ctrl
            # tensor: the provided image fills slot 0, the rest stay zero
            ctrl_c = max(c, (getattr(self.dit_config, "control_channels", 0) or 4 * c) // 4)
            out = np.zeros((1, h, w, ctrl_c), np.float32)
            if ctrl_img:
                from PIL import Image

                im = Image.open(ctrl_img).convert("RGB").resize((gen_width, gen_height))
                px = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0)[None]
                out[..., :c] = np.asarray(self.encode_images(variables, px))
            return jnp.asarray(out)

        inpaint = jnp.zeros((1, h, w, c), jnp.float32)
        mask = jnp.ones((1, h, w, 1), jnp.float32)
        ctrl = jnp.zeros((1, h, w, c), jnp.float32)
        if ctrl_img:
            from PIL import Image

            im = Image.open(ctrl_img)
            if ".inpaint." in ctrl_img and im.mode == "RGBA":
                im = im.resize((gen_width, gen_height))
                keep = np.asarray(im.split()[-1], np.float32)[None, ..., None] / 255.0
                rgb = np.asarray(im.convert("RGB"), np.float32) / 127.5 - 1.0
                lat = self.encode_images(variables, jnp.asarray(rgb)[None])
                import cv2

                keep_l = cv2.resize(keep[0, ..., 0], (w, h))[None, ..., None]
                inpaint = lat * jnp.asarray(keep_l)
                mask = jnp.asarray(1.0 - keep_l, jnp.float32)
            else:
                im = im.convert("RGB").resize((gen_width, gen_height))
                px = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0)[None]
                ctrl = self.encode_images(variables, px)
        return jnp.concatenate([inpaint, mask.astype(jnp.float32), ctrl], axis=-1)


def _space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """NHWC pixel unshuffle matching torch.nn.PixelUnshuffle channel order
    (c_out = c*f*f + fi*f + fj): [B,H,W,C] -> [B,H/f,W/f,C*f*f]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/f, W/f, C, f, f]
    return x.reshape(b, h // f, w // f, c * f * f)


def _depth_to_space(x: jax.Array, f: int) -> jax.Array:
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, h, f, w, f, C]
    return x.reshape(b, h * f, w * f, c)


def _random_blob_mask(b: int, h: int, w: int, rng) -> np.ndarray:
    """[B, h, w, 1] random elliptical blobs, 1 = inpaint region (reference
    toolkit/util/mask.generate_random_mask analog)."""
    out = np.zeros((b, h, w, 1), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(b):
        for _ in range(int(rng.integers(1, 4))):
            cy, cx = rng.random() * h, rng.random() * w
            ry = max(2.0, rng.random() * h / 2)
            rx = max(2.0, rng.random() * w / 2)
            blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            out[i, ..., 0] = np.maximum(out[i, ..., 0], blob.astype(np.float32))
    return out


@register_model
class ChromaRadianceModel(FluxModel):
    """chroma_radiance: pixel-space chroma (reference
    ``extensions_built_in/diffusion_models/chroma/chroma_radiance_model.py`` +
    ``src/radiance.py``). The chroma trunk runs on 16x16 raw pixel patches
    (no VAE — the reference wires a FakeVAE with scaling 1.0) and a NeRF/DCT
    decoder head produces pixels; T5 is the only text encoder (FakeCLIP), the
    trainer's guidance input is pinned to 0 (:337) and LoRA saves use the
    ComfyUI ``diffusion_model.*`` layout (:428-434)."""

    arch = "chroma_radiance"
    archs = ["chroma_radiance"]
    bucket_divisibility = 32  # chroma_radiance_model.py:95-97

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            pp, nh, nd, nf = 4, 8, 2, 4
            appr_h, appr_d = 64, 2
        else:
            base = FluxConfig.dev()
            # chroma_params (radiance.py:46-67)
            pp, nh, nd, nf = 16, 64, 4, 8
            appr_h, appr_d = 5120, 5
        self.dit_config = FluxConfig(**{
            **base.__dict__,
            "in_channels": 3 * pp * pp, "out_channels": 3,
            "guidance_embed": False, "chroma_mod": True,
            "approximator_hidden": appr_h, "approximator_depth": appr_d,
            "nerf_head": True, "pixel_patch": pp,
            "nerf_hidden": nh, "nerf_depth": nd, "nerf_max_freqs": nf,
        })
        self.dit = FluxDiT(self.dit_config)
        self.latent_patch = pp  # trainer image_seq_len hook

    # ---- construction: dit + t5 only (FakeCLIP / FakeVAE in the reference)

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_t5 = jax.random.split(rng)
        cfg = self.dit_config
        pp = cfg.pixel_patch
        pe = jnp.zeros((1, 8 + 16, cfg.head_dim // 2, 2, 2))
        dit_vars = self.dit.init(
            r_dit,
            jnp.zeros((1, 16, cfg.in_channels), cfg.dtype),
            jnp.zeros((1, 8, cfg.context_dim), cfg.dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.vec_dim)),
            pe,
            jnp.zeros((1,)),
            grid_hw=(4, 4),
        )
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        return {"dit": dit_vars["params"], "t5": t5_vars["params"]}

    def load_variables(self, rng: jax.Array) -> dict:
        path = self.config.name_or_path
        if path:
            from ai_toolkit_tpu.io.flux_import import load_radiance_checkpoint

            return load_radiance_checkpoint(path, self)
        return self.init_variables(rng)

    # ---- conditioning: T5 only, +1 attendable padding token ----

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        t5_ids = np.stack([self.tokenizer_t5.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(t5_ids))
        y = jnp.zeros((len(prompts), self.dit_config.vec_dim))
        # mask through eos, then modify_mask_to_attend_padding(attn_padding=1)
        # (radiance.py:70-100,294-297): one extra padding token stays visible
        ids = np.asarray(t5_ids)
        is_eos = ids == 1
        mask = np.cumsum(is_eos, axis=1) - is_eos <= 0
        lens = mask.sum(axis=1)
        for i, ln in enumerate(lens):
            if ln < mask.shape[1]:
                mask[i, ln] = True
        return {"txt": txt, "y": y, "txt_mask": jnp.asarray(mask)}

    # ---- geometry: latents ARE pixels ----

    def latent_shape(self, height: int, width: int) -> tuple[int, int, int]:
        return height, width, 3

    def image_seq_len(self, height: int, width: int) -> int:
        pp = self.dit_config.pixel_patch
        return (height // pp) * (width // pp)

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        pp = self.dit_config.pixel_patch
        ids = image_position_ids(latent_h // pp, latent_w // pp, text_len=txt_len)
        return multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )

    # ---- forward ----

    def predict(self, variables: dict, noisy_latents: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        from ai_toolkit_tpu.models.flux_dit import pack_pixels_cmajor

        b, h, w, c = noisy_latents.shape
        pp = self.dit_config.pixel_patch
        img = pack_pixels_cmajor(noisy_latents, pp)
        return self.dit.apply(
            {"params": variables["dit"],
             **{k: v for k, v in variables.items() if k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl")}},
            img,
            cond["txt"],
            t,
            cond["y"],
            cond["pe"],
            jnp.zeros(t.shape, t.dtype),  # guidance pinned to 0 (:337-338)
            cond.get("txt_mask"),
            grid_hw=(h // pp, w // pp),
        )

    def encode_images(self, variables: dict, images: jax.Array, rng=None) -> jax.Array:
        return images  # FakeVAE, scaling_factor 1.0

    def decode_latents(self, variables: dict, latents: jax.Array) -> jax.Array:
        return latents

    def lora_key_layout(self) -> str:
        return "comfy"  # diffusion_model.* (chroma_radiance_model.py:428-434)
