"""LTX-2 video model wrapper.

Parity target: the reference plugin
``extensions_built_in/diffusion_models/ltx2/ltx2.py`` (+ its converter
configs ``convert_ltx2_to_diffusers.py:275-312``): a 48-layer video DiT —
hidden 4096 (32 heads x 128), self-attention with RoPE over (t, y, x) +
cross-attention to text (Gemma-family encoder, 3840-d caption states) with
per-block adaLN modulation, patch size 1 (the VAE already compresses
32x spatial / 8x temporal into 128-ch latents), flow matching.

Structure maps 1:1 onto WanDiT (self-attn -> cross-attn -> FFN with a
shared modulation table); the LTX geometry differs only in dims and the
heavier VAE compression.

Joint audio stream (``model_kwargs: {joint_audio: true}``): the DiT becomes
``LTX2AVDiT`` (see ``ltx2_av.py``) — audio latent tokens run beside the
video tokens with bidirectional a2v/v2a cross-attention per block
(reference ``ltx2.py:945-1079``). Audio latents come from the reference's
exact mel chain by default for checkpoint training (jit log-mel -> 2D
causal ``LTXAudioVAE`` -> 16x8 packing, decode via ``LTX2Vocoder``); the
causal 1D waveform VAE is the from-scratch fallback
(``model_kwargs: {audio_vae: waveform}``). Loss is flow matching on both
streams (shared sigma, the reference's default — ``use_cross_timestep``
off).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
from ai_toolkit_tpu.models.ltx_video_vae import LTXVideoVAE, LTXVideoVAEConfig
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
class LTX2Model(BaseTpuModel):
    arch = "ltx2"
    archs = ["ltx2", "ltx2_3", "ltx2.3", "ltxv", "minimax_h3"]
    is_flow_matching = True
    bucket_divisibility = 32  # 32x spatial VAE
    max_txt_len = 256

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        size = config.model_kwargs.get("size", "full")
        self.joint_audio = bool(config.model_kwargs.get("joint_audio", False))
        self.audio_backend = "waveform"
        if size == "tiny":
            self.dit_config = WanConfig.tiny()
            self.vae_config = LTXVideoVAEConfig.tiny()
            self.llm_config = LLMConfig.tiny()
            self.max_txt_len = 16
        else:
            self.dit_config = WanConfig(
                in_channels=128, dim=4096, ffn_dim=16384, num_heads=32, num_layers=48,
                text_dim=3840, patch_size=(1, 1, 1), axes_dim=(32, 48, 48),
            )
            # exact AutoencoderKLLTX2Video geometry: 128-ch latents,
            # 32x spatial / 8x temporal (vae_scale_factors (8,32,32))
            self.vae_config = LTXVideoVAEConfig.ltx2()
            # Gemma-family caption encoder (3840-d states)
            self.llm_config = LLMConfig(
                vocab_size=256_000, d_model=3840, n_layers=48, n_heads=16, n_kv_heads=8,
                head_dim=240, d_ff=15360, post_norms=True, gemma_gelu=True,
                scale_embeddings=True,
            )
        if self.joint_audio:
            from ai_toolkit_tpu.models.audio_vae import AudioAutoencoderKL, AudioVAEConfig
            from ai_toolkit_tpu.models.ltx2_av import LTX2AVConfig, LTX2AVDiT

            # 'mel' = the reference's exact chain (log-mel -> 2D taming-style
            # causal VAE -> 16x8 token packing, decode via LTX2Vocoder;
            # convert_ltx2_to_diffusers.py:84-86 — the audio VAE is part of
            # every real checkpoint). 'waveform' = the on-device 1D causal
            # waveform VAE (random-init experiments only). Default: 'mel'
            # whenever a real checkpoint directory is in play, so checkpoint
            # training always uses reference numerics.
            import os as _os

            backend = config.model_kwargs.get("audio_vae")
            ckpt_dir = str(config.name_or_path or "")
            has_ckpt_audio = _os.path.isdir(_os.path.join(ckpt_dir, "audio_vae"))
            if backend is None:
                backend = "mel" if (has_ckpt_audio or _os.path.isdir(ckpt_dir)) \
                    else "waveform"
            if backend != "mel" and has_ckpt_audio:
                print(
                    "WARNING: ltx2 joint-audio with audio_vae="
                    f"'{backend}' but '{ckpt_dir}/audio_vae' exists — the "
                    "checkpoint's mel audio VAE will NOT be loaded and audio "
                    "trains against a random-init waveform VAE. Drop the "
                    "audio_vae override (or set audio_vae: mel) for "
                    "reference numerics."
                )
            self.audio_backend = backend
            if size == "tiny":
                self.av_config = LTX2AVConfig.tiny()
                if self.audio_backend == "mel":
                    from ai_toolkit_tpu.models.ltx_audio_vae import LTXAudioVAEConfig
                    from ai_toolkit_tpu.models.ltx_vocoder import VocoderConfig

                    # packed dim (mel/2) * z = 4 == tiny audio_in_channels
                    self.audio_vae_config = LTXAudioVAEConfig(
                        base_channels=8, ch_mult=(1, 2), num_res_blocks=1,
                        latent_channels=2, mel_bins=4,
                    )
                    self.vocoder_config = VocoderConfig.tiny()
                else:
                    self.audio_vae_config = AudioVAEConfig.tiny()
            else:
                self.av_config = LTX2AVConfig(video=self.dit_config)
                if self.audio_backend == "mel":
                    from ai_toolkit_tpu.models.ltx_audio_vae import LTXAudioVAEConfig
                    from ai_toolkit_tpu.models.ltx_vocoder import VocoderConfig

                    # mel 64 -> 16 lat bins x 8 z = 128 == audio_in_channels
                    self.audio_vae_config = LTXAudioVAEConfig.ltx2()
                    self.vocoder_config = VocoderConfig.ltx2()
                else:
                    # 128-ch audio latents at ~47 latent frames/sec (256x
                    # compression of 48kHz stereo ≈ the reference's mel+VAE
                    # total compression)
                    self.audio_vae_config = AudioVAEConfig(latent_channels=128)
            self.dit = LTX2AVDiT(self.av_config)
            if self.audio_backend == "mel":
                from ai_toolkit_tpu.models.ltx_audio_vae import LTXAudioVAE
                from ai_toolkit_tpu.models.ltx_vocoder import LTX2Vocoder

                self.audio_vae = LTXAudioVAE(self.audio_vae_config)
                self.vocoder = LTX2Vocoder(self.vocoder_config)
            else:
                self.audio_vae = AudioAutoencoderKL(self.audio_vae_config)
        else:
            self.dit = WanDiT(self.dit_config)
        self.vae = LTXVideoVAE(self.vae_config)
        self.te = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=1, max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        pt, ph, pw = cfg.patch_size
        n = 8
        patch_dim = cfg.in_channels * pt * ph * pw
        pe = jnp.zeros((1, n, cfg.head_dim // 2, 2, 2))
        if self.joint_audio:
            na = 4
            pe_a = jnp.zeros((1, na, self.av_config.audio_head_dim // 2, 2, 2))
            dit_vars = self.dit.init(
                r_dit, jnp.zeros((1, n, patch_dim)),
                jnp.zeros((1, na, self.av_config.audio_in_channels)),
                jnp.zeros((1, 8, cfg.text_dim)), jnp.zeros((1,)), pe, pe_a,
            )
        else:
            dit_vars = self.dit.init(
                r_dit, jnp.zeros((1, n, patch_dim)), jnp.zeros((1, 8, cfg.text_dim)),
                jnp.zeros((1,)), pe, None,
            )
        td, sd_ = self.vae_config.temporal_downscale, self.vae_config.spatial_downscale
        vae_vars = self.vae.init(r_vae, jnp.zeros((1, td + 1, 2 * sd_, 2 * sd_, 3)))
        te_vars = self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))
        out = {"dit": dit_vars["params"], "vae": vae_vars["params"], "te": te_vars["params"]}
        if self.joint_audio:
            if self.audio_backend == "mel":
                mc = self.audio_vae_config
                avae = self.audio_vae.init(
                    jax.random.fold_in(r_vae, 3),
                    jnp.zeros((1, 2 * mc.time_downscale, mc.mel_bins, mc.in_channels)),
                )
                out["audio_vae"] = avae["params"]
                out["vocoder"] = self.vocoder.init(
                    jax.random.fold_in(r_vae, 4),
                    jnp.zeros((1, 4, self.vocoder_config.in_channels)),
                )["params"]
            else:
                avae = self.audio_vae.init(
                    jax.random.fold_in(r_vae, 3),
                    jnp.zeros((1, 4 * self.audio_vae_config.downscale,
                               self.audio_vae_config.in_channels)),
                )
                out["audio_vae"] = avae["params"]
        return out

    def load_variables(self, rng: jax.Array) -> dict:
        import os

        path = self.config.name_or_path
        if path and (os.path.isdir(os.path.join(path, "transformer")) or os.path.isfile(path)):
            from ai_toolkit_tpu.io.dit_importers import load_ltx2_checkpoint

            return load_ltx2_checkpoint(path, self)
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt}

    def rope_table(self, t: int, h: int, w: int) -> jnp.ndarray:
        cfg = self.dit_config
        pt, ph, pw = cfg.patch_size
        ids = wan_position_ids(max(1, t // pt), h // ph, w // pw)
        return multi_axis_rope(ids, list(cfg.axes_dim))

    def enable_sequence_parallel(self, mesh, axis: str = "sp") -> None:
        """Ring-attention context parallelism over video tokens (see
        wan_model.enable_sequence_parallel). Video-only path — the joint AV
        model keeps single-shard attention (audio stream is short)."""
        if self.joint_audio:
            print("sequence parallel: skipped (joint AV model)")
            return
        from dataclasses import replace

        from ai_toolkit_tpu.models.wan_dit import WanDiT as _WanDiT

        self.dit_config = replace(self.dit_config, sp_axis=axis)
        self.dit = _WanDiT(self.dit_config)
        self._sp = (mesh, axis)

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, T, h, w, C] video latents (T=1 for images).

        Joint audio: when ``cond['noisy_audio']`` ([B, T_a, C_a]) is present,
        returns (video_pred, audio_pred)."""
        b, tt, hh, ww, c = noisy_latents.shape
        cfg = self.dit_config
        tokens = wan_patchify(noisy_latents, cfg.patch_size)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        if self.joint_audio:
            if "noisy_audio" in cond:
                out_v, out_a = self.dit.apply(
                    colls, tokens, cond["noisy_audio"], cond["txt"], t,
                    cond["pe"], cond["pe_audio"],
                )
                return wan_unpatchify(out_v, tt, hh, ww, cfg.patch_size, c), out_a
            # video-only batch on the AV model: single silent audio token
            xa = jnp.zeros((b, 1, self.av_config.audio_in_channels), tokens.dtype)
            out_v, _ = self.dit.apply(
                colls, tokens, xa, cond["txt"], t, cond["pe"], self.audio_rope_table(1)
            )
            return wan_unpatchify(out_v, tt, hh, ww, cfg.patch_size, c)
        from ai_toolkit_tpu.models.wan_model import sp_dit_apply

        out = sp_dit_apply(
            self.dit, getattr(self, "_sp", None), colls, tokens, cond["txt"], t,
            cond["pe"], None,
        )
        return wan_unpatchify(out, tt, hh, ww, cfg.patch_size, c)

    def encode_audio(self, variables, waveform, rng=None):
        """[B, S, C] waveform -> [B, T_a, audio_in_channels] audio tokens."""
        if self.audio_backend == "mel":
            # the reference chain: log-mel -> 2D causal VAE -> token packing
            from ai_toolkit_tpu.models.ltx_audio_vae import (
                LTXAudioVAE, log_mel_jax, pack_audio_latents,
            )

            mc = self.audio_vae_config
            mel = log_mel_jax(waveform, mc.sample_rate, n_mels=mc.mel_bins)
            # trim to the VAE's temporal grid
            t = (mel.shape[1] // mc.time_downscale) * mc.time_downscale
            z = self.audio_vae.apply(
                {"params": variables["audio_vae"]}, mel[:, :t], rng,
                method=LTXAudioVAE.encode,
            )
            return pack_audio_latents(z)
        from ai_toolkit_tpu.models.audio_vae import AudioAutoencoderKL

        return self.audio_vae.apply(
            {"params": variables["audio_vae"]}, waveform, rng,
            method=AudioAutoencoderKL.encode,
        )

    def decode_audio(self, variables, latents):
        """[B, T_a, audio_in_channels] audio tokens -> [B, S, C] waveform."""
        if self.audio_backend == "mel":
            from ai_toolkit_tpu.models.ltx_audio_vae import (
                LTXAudioVAE, unpack_audio_latents,
            )
            from ai_toolkit_tpu.models.ltx_vocoder import stack_stereo_mel

            mc = self.audio_vae_config
            mel_lat = mc.mel_bins // mc.time_downscale
            z = unpack_audio_latents(latents, mel_lat)
            mel = self.audio_vae.apply(
                {"params": variables["audio_vae"]}, z, method=LTXAudioVAE.decode
            )
            return self.vocoder.apply(
                {"params": variables["vocoder"]}, stack_stereo_mel(mel)
            )
        from ai_toolkit_tpu.models.audio_vae import AudioAutoencoderKL

        return self.audio_vae.apply(
            {"params": variables["audio_vae"]}, latents, method=AudioAutoencoderKL.decode
        )

    def audio_rope_table(self, n_tokens: int) -> jnp.ndarray:
        """1D rope over audio latent time (reference audio_rope coords)."""
        ids = jnp.arange(n_tokens, dtype=jnp.int32)[None, :, None]
        return multi_axis_rope(ids, [self.av_config.audio_head_dim])

    def encode_images(self, variables, images, rng=None):
        # causal VAE: a lone image is a T=1 video (8k+1 frame grid)
        if images.ndim == 4:
            images = images[:, None]
        return self.vae.apply(
            {"params": variables["vae"]}, images, rng, method=LTXVideoVAE.encode
        )

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=LTXVideoVAE.decode)

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
        # ltx wants 8k+1 frames (tiny: 2k+1)
        td = self.vae_config.temporal_downscale
        return max(1, ((frames - 1) // td) * td + 1)

    def lora_targets(self):
        return wan_lora_targets()

    def partition_rules(self):
        if self.joint_audio:
            from ai_toolkit_tpu.models.ltx2_av import av_partition_rules

            return av_partition_rules(self.dit_config.scan_blocks)
        return wan_partition_rules(self.dit_config.scan_blocks)
