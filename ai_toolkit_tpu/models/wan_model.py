"""Wan 2.x video model wrappers (t2v + i2v).

Parity target: reference wan21/wan21_i2v/wan22_* archs
(``/root/reference/toolkit/models/wan21/wan21.py``, plugin wan22 dirs):
flow-matching video DiT, umt5 text conditioning, causal 3D VAE, frame-count
buckets, i2v first-frame conditioning. Multistage (wan22 MoE-style boundary
switching, SDTrainer.py:2199) is modeled as two expert DiTs selected by a
timestep boundary.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder
from ai_toolkit_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, CLIPVisionModel
from ai_toolkit_tpu.models.wan_vae import WanVAE, WanVAEConfig
from ai_toolkit_tpu.models.wan_dit import (
    WanConfig,
    WanDiT,
    multi_axis_rope,
    wan_lora_targets,
    wan_partition_rules,
    wan_patchify,
    wan_position_ids,
    wan_unpatchify,
)
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer


@register_model
class WanModel(BaseTpuModel):
    arch = "wan21"
    archs = ["wan21", "wan21_i2v", "wan22_5b", "wan22_14b", "wan22_14b_i2v"]
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 512

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "1.3b")
        if config.arch == "wan22_5b" and size not in ("tiny", "5b"):
            size = "5b"
        i2v = config.arch.endswith("i2v")
        # wan2.2 14B pairs are MoE-style high/low-noise experts switched at a
        # timestep boundary (reference multistage, SDTrainer.py:2199-2210);
        # the 2.2 TI2V-5B is a single transformer (wan22_5b_model.py:83).
        self.multistage = config.arch.startswith("wan22_14b") or bool(
            config.model_kwargs.get("multistage")
        )
        self.stage_boundary = float(config.model_kwargs.get("stage_boundary", 0.875))
        if size == "tiny":
            self.vision_config = CLIPVisionConfig.tiny() if i2v else None
            self.dit_config = WanConfig(**{**WanConfig.tiny().__dict__, "i2v": i2v,
                                           "img_cond_dim": 64})
            # wan22_5b exercises the residual/patchified 2.2 VAE end-to-end
            self.vae_config = (WanVAEConfig.tiny22() if config.arch == "wan22_5b"
                               else WanVAEConfig.tiny())
            # wan's TE is umt5 (per-layer relative bias)
            self.t5_config = T5Config(**{**T5Config.tiny().__dict__, "per_layer_bias": True})
            self.max_txt_len = 16
        elif size == "5b":
            self.vision_config = None
            self.dit_config = WanConfig(**{**WanConfig.wan22_5b().__dict__})
            self.vae_config = WanVAEConfig.wan22_5b()
            self.t5_config = T5Config(**{**T5Config.xxl().__dict__, "per_layer_bias": True})
        elif size in ("14b", "14B"):
            self.vision_config = CLIPVisionConfig.vit_h() if i2v else None
            self.dit_config = WanConfig(**{**WanConfig.wan21_14b().__dict__, "i2v": i2v})
            self.vae_config = WanVAEConfig.wan21()
            self.t5_config = T5Config(**{**T5Config.xxl().__dict__, "per_layer_bias": True})
        else:
            self.vision_config = CLIPVisionConfig.vit_h() if i2v else None
            self.dit_config = WanConfig(**{**WanConfig.wan21_1_3b().__dict__, "i2v": i2v})
            self.vae_config = WanVAEConfig.wan21()
            self.t5_config = T5Config(**{**T5Config.xxl().__dict__, "per_layer_bias": True})
        # 2.2 5B: 16x VAE compression x 2x2 DiT patch (wan22_5b_model.py:122)
        if size == "5b":
            self.bucket_divisibility = 32
        self.dit = WanDiT(self.dit_config)
        self.vae = WanVAE(self.vae_config)
        self.t5 = T5Encoder(self.t5_config)
        self.clip_vision = CLIPVisionModel(self.vision_config) if self.vision_config else None
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.t5_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_t5 = jax.random.split(rng, 3)
        cfg = self.dit_config
        pt, ph, pw = cfg.patch_size
        n = 2 * 2 * 2
        patch_dim = cfg.in_channels * pt * ph * pw
        pe = jnp.zeros((1, n, cfg.head_dim // 2, 2, 2))
        img_cond = jnp.zeros((1, 4, cfg.img_cond_dim)) if cfg.i2v else None
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n, patch_dim)), jnp.zeros((1, 8, cfg.text_dim)),
            jnp.zeros((1,)), pe, img_cond,
        )
        td, sd_ = self.vae_config.temporal_downscale, self.vae_config.spatial_downscale
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, td + 1, 2 * sd_, 2 * sd_, 3))
        )
        t5_vars = self.t5.init(r_t5, jnp.zeros((1, self.max_txt_len), jnp.int32))
        out = {"dit": dit_vars["params"], "vae": vae_vars["params"], "t5": t5_vars["params"]}
        if self.clip_vision is not None:
            sz = self.vision_config.image_size
            out["clip_vision"] = self.clip_vision.init(
                jax.random.fold_in(r_dit, 7), jnp.zeros((1, sz, sz, 3))
            )["params"]
        if self.multistage:
            # second expert (low-noise); "dit" is the high-noise expert
            r_low = jax.random.fold_in(r_dit, 1)
            out["dit_low"] = self.dit.init(
                r_low, jnp.zeros((1, n, patch_dim)), jnp.zeros((1, 8, cfg.text_dim)),
                jnp.zeros((1,)), pe, img_cond,
            )["params"]
        return out

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_wan_checkpoint

            return load_wan_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt}

    def encode_image_cond(self, variables: dict, first_frame: jax.Array) -> jax.Array:
        """i2v conditioning: first frame [B, H, W, 3] -> clip-vision tokens
        [B, N, img_cond_dim] (penultimate hidden states, wan i2v convention)."""
        sz = self.vision_config.image_size
        px = jax.image.resize(first_frame, (first_frame.shape[0], sz, sz, 3), "bilinear")
        out = self.clip_vision.apply({"params": variables["clip_vision"]}, px)
        return out["penultimate_hidden_state"]

    def rope_table(self, t: int, h: int, w: int) -> jnp.ndarray:
        cfg = self.dit_config
        pt, ph, pw = cfg.patch_size
        ids = wan_position_ids(t // pt, h // ph, w // pw)
        return multi_axis_rope(ids, list(cfg.axes_dim))

    def enable_sequence_parallel(self, mesh, axis: str = "sp") -> None:
        """Context parallelism for long videos (SURVEY §5 — no reference
        equivalent to port): video tokens + rope shard over the ``axis`` mesh
        dim, block self-attention becomes ring attention (K/V shards rotate
        via ppermute), everything else stays per-token. Uses partial-auto
        ``jax.shard_map`` so fsdp/tp param sharding keeps working inside."""
        from dataclasses import replace

        from ai_toolkit_tpu.models.wan_dit import WanDiT as _WanDiT

        self.dit_config = replace(self.dit_config, sp_axis=axis)
        self.dit = _WanDiT(self.dit_config)
        self._sp = (mesh, axis)

    def _dit_apply(self, colls, tokens, txt, t, pe, img_cond):
        return sp_dit_apply(
            self.dit, getattr(self, "_sp", None), colls, tokens, txt, t, pe, img_cond
        )

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, T, h, w, C] video latents. Optional
        cond['control_latents'] [B, T, h, w, C_ctrl] are patchified separately
        and feature-concatenated — with a 'ctrl' expansion on patch_embedding
        this equals the reference FrameEmbedder's two-convs-summed i2v
        conditioning (i2v_adapter.py:73-109)."""
        b, tt, hh, ww, c = noisy_latents.shape
        cfg = self.dit_config
        tokens = wan_patchify(noisy_latents, cfg.patch_size)
        if cond.get("control_latents") is not None:
            tokens = jnp.concatenate(
                [tokens, wan_patchify(cond["control_latents"], cfg.patch_size)],
                axis=-1,
            )
        adapters = {k: variables[k] for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl") if k in variables}

        def run(params):
            return self._dit_apply(
                {"params": params, **adapters}, tokens, cond["txt"], t, cond["pe"],
                cond.get("img_cond"),
            )

        if self.multistage and "dit_low" in variables:
            # expert routing by timestep: t >= boundary -> high-noise expert.
            # lax.cond keeps one expert's FLOPs per step; adapters are shared.
            import jax as _jax

            high = jnp.mean(t) >= self.stage_boundary
            out = _jax.lax.cond(
                high, lambda: run(variables["dit"]), lambda: run(variables["dit_low"])
            )
        else:
            out = run(variables["dit"])
        return wan_unpatchify(out, tt, hh, ww, cfg.patch_size, c)

    def encode_images(self, variables, images, rng=None):
        """images: [B, T, H, W, 3] (or [B, H, W, 3] = single-frame video).

        The causal VAE encodes T = td*k+1 frames to k+1 latent frames; a lone
        image is a T=1 video (reference wan trains images the same way)."""
        if images.ndim == 4:
            images = images[:, None]
        return self.vae.apply(
            {"params": variables["vae"]}, images, rng, method=WanVAE.encode
        )

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=WanVAE.decode)

    def latent_shape(self, height: int, width: int, num_frames: int = 1):
        sd_ = self.vae_config.spatial_downscale
        td = self.vae_config.temporal_downscale
        t = (max(1, num_frames) - 1) // td + 1
        return t, height // sd_, width // sd_, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        cfg = self.dit_config
        _, h, w, _ = self.latent_shape(height, width)
        return (h // cfg.patch_size[1]) * (w // cfg.patch_size[2])

    def frame_count_snapper(self, frames: int) -> int:
        """Snap to the causal VAE's temporal grid: td*k+1 frames
        (reference get_frame_count_snapper — wan wants 4k+1)."""
        td = self.vae_config.temporal_downscale
        return max(1, ((frames - 1) // td) * td + 1)

    def lora_targets(self):
        return wan_lora_targets()

    def partition_rules(self):
        return wan_partition_rules(self.dit_config.scan_blocks)


def sp_dit_apply(dit, sp, colls, tokens, txt, t, pe, img_cond):
    """Apply a WanDiT-style module, optionally inside a partial-auto
    ``jax.shard_map`` that shards tokens+rope over the 'sp' mesh axis
    (ring self-attention inside; fsdp/tp stay under the auto partitioner)."""
    if sp is None:
        return dit.apply(colls, tokens, txt, t, pe, img_cond)
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    mesh, axis = sp
    tok = P(None, axis)
    if img_cond is None:

        def fwd(colls, tokens, txt, t, pe):
            return dit.apply(colls, tokens, txt, t, pe, None)

        return _jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), tok, P(), P(), tok),
            out_specs=tok, axis_names={axis},
        )(colls, tokens, txt, t, pe)

    def fwd(colls, tokens, txt, t, pe, img_cond):
        return dit.apply(colls, tokens, txt, t, pe, img_cond)

    return _jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), tok, P(), P(), tok, P()),
        out_specs=tok, axis_names={axis},
    )(colls, tokens, txt, t, pe, img_cond)
