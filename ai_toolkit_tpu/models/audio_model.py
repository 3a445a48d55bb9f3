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
import os
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
        # EXACT mode: the released AIO single-file checkpoint (DiT + Oobleck
        # VAE + Qwen3-0.6B TE under one safetensors; reference src/model.py
        # load_models). Directory-less random-init keeps the WanDiT stand-in.
        path = config.name_or_path or ""
        self.exact = os.path.isfile(path) and path.endswith(".safetensors")
        if self.exact:
            self._init_exact(path)
            return
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

    # ---- exact ACE-Step 1.5 path ----

    sample_rate = 48000
    latent_rate = 25  # 48000 / 1920 (reference LATENT_RATE)

    def _init_exact(self, path: str):
        import json

        from safetensors import safe_open

        from ai_toolkit_tpu.io.ace_import import (
            infer_ace_config,
            infer_oobleck_config,
            split_ace_checkpoint,
        )
        from ai_toolkit_tpu.models.ace_dit import AceConfig, AceStep15
        from ai_toolkit_tpu.models.ace_vae import AceOobleckVAE, OobleckConfig
        from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder

        flat = {}
        with safe_open(path, "np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        self._sds = split_ace_checkpoint(flat)
        kw = infer_ace_config(self._sds[0])
        self.ace_config = AceConfig(
            hidden=kw["hidden"], text_dim=kw["text_dim"], timbre_dim=kw["timbre_dim"],
            out_ch=kw["out_ch"], in_ch=kw["in_ch"], n_dit=kw["n_dit"],
            n_lyric=kw["n_lyric"], n_timbre=kw["n_timbre"], heads=kw["heads"],
            kv=kw["kv"], head_dim=kw["head_dim"], inter=kw["inter"],
            patch=kw["patch"], enc_hidden=kw["enc_hidden"],
            enc_heads=kw["enc_heads"], enc_kv=kw["enc_kv"],
            enc_inter=kw["enc_inter"],
            dtype=jnp.bfloat16, param_dtype=jnp.float32,
        )
        self.ace = AceStep15(self.ace_config)
        self.oobleck_config = OobleckConfig(**infer_oobleck_config(self._sds[1]))
        self.oobleck = AceOobleckVAE(self.oobleck_config)
        # Qwen3-Embedding-0.6B dims (reference load_models qwen_cfg); a tiny
        # synthetic checkpoint infers its own dims off the tensors
        te_sd = self._sds[2]
        d_model = int(te_sd["embed_tokens.weight"].shape[1])
        n_layers = 1 + max(int(k.split(".")[1]) for k in te_sd if k.startswith("layers."))
        hd = int(te_sd["layers.0.self_attn.q_norm.weight"].shape[0])
        self.llm_config = LLMConfig(
            vocab_size=int(te_sd["embed_tokens.weight"].shape[0]),
            d_model=d_model, n_layers=n_layers,
            n_heads=int(te_sd["layers.0.self_attn.q_proj.weight"].shape[0]) // hd,
            n_kv_heads=int(te_sd["layers.0.self_attn.k_proj.weight"].shape[0]) // hd,
            head_dim=hd,
            d_ff=int(te_sd["layers.0.mlp.gate_proj.weight"].shape[0]),
            rope_theta=1_000_000.0, rms_eps=1e-6, qk_head_norm=True,
            dtype=jnp.bfloat16,
        )
        self.llm = LLMEncoder(self.llm_config)
        self.tokenizer = load_tokenizer(
            os.path.dirname(path), "tokenizer",
            vocab_size=self.llm_config.vocab_size,
            eos_id=min(151643, self.llm_config.vocab_size - 1), max_len=256,
        )
        sil = json.load(open(os.path.join(os.path.dirname(__file__),
                                          "ace_silence_latent.json")))
        head = np.asarray(sil["head"], np.float32).reshape(4, 64)
        self._silence_head = head
        self._silence_body = np.asarray(sil["body"], np.float32)

    def silence_latent(self, length: int) -> np.ndarray:
        """[1, T, 64] fixed silence latents (reference get_silence_latent);
        zeros for non-release latent widths (tiny test checkpoints)."""
        d = self.ace_config.out_ch
        if d != self._silence_body.shape[0]:
            return np.zeros((1, length, d), np.float32)
        body = np.tile(self._silence_body[None, None], (1, length, 1))
        n = min(4, length)
        body[:, :n] = self._silence_head[:n]
        return body

    def init_variables(self, rng: jax.Array) -> dict:
        if self.exact:
            return self.load_variables(rng)
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
        if self.exact:
            from ai_toolkit_tpu.io.ace_import import load_ace_dit, load_ace_vae
            from ai_toolkit_tpu.io.sd_import import llm_rules
            from ai_toolkit_tpu.io.torch_import import torch_to_tree

            dit_sd, vae_sd, te_sd = self._sds
            dit, _ = load_ace_dit(dit_sd)
            vae = load_ace_vae(vae_sd, n_blocks=len(self.oobleck_config.c_mults))
            te, unmatched = torch_to_tree(te_sd, llm_rules())
            extra = [k for k in unmatched if "rotary" not in k]
            if extra:
                print(f"ace TE import: {len(extra)} unmapped keys, first {extra[:3]}")
            return {"dit": dit, "vae": vae, "te": te}
        return self.init_variables(rng)

    def _sft_caption(self, parsed: dict) -> str:
        metas = (f"- bpm: {parsed.get('bpm', 120)}\n"
                 f"- timesignature: {parsed.get('timesignature') or '4/4'}\n"
                 f"- keyscale: {parsed.get('keyscale') or 'C'}\n"
                 f"- duration: {int(parsed.get('duration') or 10)} seconds\n")
        return ("# Instruction\nFill the audio semantic mask based on the given "
                f"conditions:\n\n# Caption\n{parsed.get('caption', '')}\n\n"
                f"# Metas\n{metas}<|endoftext|>\n")

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        if self.exact:
            return self._encode_prompt_exact(variables, prompts)
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.t5.apply)({"params": variables["t5"]}, jnp.asarray(ids))
        return {"txt": txt}

    def _encode_prompt_exact(self, variables: dict, prompts: list[str]) -> dict:
        """Tagged captions -> SFT template -> Qwen3 TE -> ConditionEncoder
        (reference pipeline.get_text_embedings + transformer.prepare_condition
        with a silence reference clip)."""
        from ai_toolkit_tpu.data.captions import parse_ace_caption

        conds = []
        for p in prompts:
            parsed = parse_ace_caption(p)
            cap_ids = np.asarray(self.tokenizer.encode(self._sft_caption(parsed)))
            lyr_text = (f"# Languages\n{parsed.get('language') or 'en'}\n\n"
                        f"# Lyric\n{parsed.get('lyrics', '')}<|endoftext|>")
            lyr_ids = np.asarray(self.tokenizer.encode(lyr_text))
            text_h = self.llm.apply(
                {"params": variables["te"]}, jnp.asarray(cap_ids)[None]
            )
            if isinstance(text_h, dict):
                text_h = text_h["last_hidden_state"]
            # lyrics use raw token embeddings only (TextEncoder.encode_lyrics)
            lyric_h = jnp.take(
                jnp.asarray(variables["te"]["token_embedding"]),
                jnp.asarray(lyr_ids)[None], axis=0,
            )
            # silence reference clip (released ckpts: timbre_dim == latent 64)
            if self.ace_config.timbre_dim == self.ace_config.out_ch:
                ref = jnp.asarray(self.silence_latent(750))
            else:
                ref = jnp.zeros((1, 750, self.ace_config.timbre_dim), jnp.float32)
            from ai_toolkit_tpu.models.ace_dit import AceTimbreEncoder

            cls = AceTimbreEncoder(self.ace_config).apply(
                {"params": variables["dit"]["encoder"]["timbre_encoder"]}, ref
            )
            text_m = jnp.ones((1, cap_ids.shape[0]), jnp.int32)
            lyric_m = jnp.ones((1, lyr_ids.shape[0]), jnp.int32)
            enc_h, enc_m = self.ace.apply(
                {"params": variables["dit"]},
                text_h.astype(jnp.float32), text_m,
                lyric_h.astype(jnp.float32), lyric_m,
                cls[:, None, :], jnp.ones((1, 1), jnp.int32),
                method=self.ace.encode_condition,
            )
            conds.append((enc_h, enc_m))
        max_s = max(c[0].shape[1] for c in conds)
        enc_h = jnp.concatenate([
            jnp.pad(h, ((0, 0), (0, max_s - h.shape[1]), (0, 0))) for h, _ in conds
        ])
        enc_m = jnp.concatenate([
            jnp.pad(m.astype(jnp.int32), ((0, 0), (0, max_s - m.shape[1]))) for _, m in conds
        ])
        return {"enc_h": enc_h, "enc_m": enc_m}

    def predict(self, variables, noisy_latents, t, cond):
        """noisy_latents: [B, T_lat, C] audio latents."""
        b, n, c = noisy_latents.shape
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        if self.exact:
            # context = [silence latents, ones] (ace_step_15_model.py:299-303);
            # timestep_r == timestep in every training/sampling flow
            sil = jnp.asarray(np.tile(self.silence_latent(n), (b, 1, 1)),
                              noisy_latents.dtype)
            context = jnp.concatenate([sil, jnp.ones_like(sil)], axis=-1)
            return self.ace.apply(
                colls, noisy_latents, t, t, cond["enc_h"].astype(noisy_latents.dtype),
                context,
            )
        out = self.dit.apply(colls, noisy_latents, cond["txt"], t, cond["pe"], None)
        return out

    def encode_audio(self, variables, waveform, rng=None):
        """waveform: [B, T, C] in [-1, 1] -> [B, T/downscale, latent_ch]."""
        if self.exact:
            from ai_toolkit_tpu.models.ace_vae import AceOobleckVAE

            return self.oobleck.apply(
                {"params": variables["vae"]}, waveform, method=AceOobleckVAE.encode
            )
        return self.vae.apply(
            {"params": variables["vae"]}, waveform, rng, method=AudioAutoencoderKL.encode
        )

    # encode_images alias so the generic caching path works on audio too
    encode_images = encode_audio

    def decode_latents(self, variables, latents):
        if self.exact:
            from ai_toolkit_tpu.models.ace_vae import AceOobleckVAE

            return self.oobleck.apply(
                {"params": variables["vae"]}, latents, method=AceOobleckVAE.decode
            )
        return self.vae.apply({"params": variables["vae"]}, latents, method=AudioAutoencoderKL.decode)

    def latent_shape_audio(self, num_samples: int):
        if self.exact:
            d = self.oobleck_config.upscale_factor
            return num_samples // d, self.oobleck_config.latent_dim
        return num_samples // self.vae_config.downscale, self.vae_config.latent_channels

    def rope_table(self, n_tokens: int) -> jnp.ndarray | None:
        if self.exact:
            return None  # the exact DiT builds its own rotary tables
        ids = wan_position_ids(n_tokens, 1, 1)
        dims = [d for d in self.dit_config.axes_dim if d > 0]
        return multi_axis_rope(ids[..., : len(dims)], dims)

    def lora_targets(self):
        if self.exact:
            # reference target_lora_modules = ['DiTModel'] -> every Linear
            # inside the decoder
            return [r"decoder/"]
        return wan_lora_targets()

    def partition_rules(self):
        if self.exact:
            from ai_toolkit_tpu.parallel.sharding import PartitionRule
            from jax.sharding import PartitionSpec as P

            return [
                PartitionRule(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel", P("fsdp", "tp")),
                PartitionRule(r"(o_proj|down_proj)/kernel", P("tp", "fsdp")),
            ]
        return wan_partition_rules(self.dit_config.scan_blocks)
