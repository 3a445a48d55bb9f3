"""Local-weights VLM captioning backend (reference
``extensions_built_in/captioner/Qwen3VLCaptioner`` class of jobs).

A LLaVA-style pipeline built from the in-repo goldened towers: CLIP-vision
patch states -> linear projector -> soft prefix tokens prepended to the
prompt embedding, decoded greedily through the causal LLM with the
tied-embedding head. Weights load from a local HF-layout directory:

    model_name_or_path/
      vision_tower/model.safetensors        (CLIP-vision layout)
      language_model/*.safetensors          (llama/qwen2/gemma2 layout)
      projector.safetensors                 (optional: {"kernel"|"weight"})
      tokenizer/tokenizer.json              (optional)

This environment is zero-egress, so tests run the ``size: tiny`` random-init
path, which is fully deterministic (fixed seed + greedy decode). With real
weights the same code paths load through the goldened import rules
(``io/sd_import.clip_vision_rules`` / ``llm_rules``).
"""

from __future__ import annotations

import os

import numpy as np


class VLMCaptioner:
    def __init__(self, model_path: str | None = None, size: str = "tiny",
                 prompt: str = "Describe this image in detail.",
                 max_new_tokens: int = 24, seed: int = 0):
        import jax

        from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
        from ai_toolkit_tpu.models.text_encoders.clip_vision import (
            CLIPVisionConfig,
            CLIPVisionModel,
        )
        from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

        if model_path:
            # dims from the language_model config.json when present
            import json

            lm_cfg_path = os.path.join(model_path, "language_model", "config.json")
            if os.path.isfile(lm_cfg_path):
                hf = json.load(open(lm_cfg_path))
                self.llm_config = LLMConfig(
                    vocab_size=hf.get("vocab_size", 128256),
                    d_model=hf.get("hidden_size", 4096),
                    n_layers=hf.get("num_hidden_layers", 32),
                    n_heads=hf.get("num_attention_heads", 32),
                    n_kv_heads=hf.get("num_key_value_heads", 8),
                    head_dim=hf.get("head_dim", hf.get("hidden_size", 4096)
                                    // hf.get("num_attention_heads", 32)),
                    d_ff=hf.get("intermediate_size", 14336),
                    rope_theta=hf.get("rope_theta", 500000.0),
                    rms_eps=hf.get("rms_norm_eps", 1e-5),
                )
            else:
                self.llm_config = LLMConfig()
            self.vision_config = CLIPVisionConfig.vit_l()
        else:
            self.llm_config = LLMConfig.tiny(d_model=64)
            self.vision_config = CLIPVisionConfig.tiny()
        self.prompt = prompt
        self.max_new_tokens = int(max_new_tokens)
        self.llm = LLMEncoder(self.llm_config)
        self.vision = CLIPVisionModel(self.vision_config)
        self.tokenizer = load_tokenizer(
            model_path, "tokenizer", vocab_size=self.llm_config.vocab_size,
            eos_id=2, max_len=64,
        )

        rngs = jax.random.split(jax.random.key(seed), 3)
        img0 = np.zeros((1, self.vision_config.image_size,
                         self.vision_config.image_size, 3), np.float32)
        self.v_params = self.vision.init(rngs[0], img0)["params"]
        ids0 = np.zeros((1, 8), np.int32)
        self.l_params = self.llm.init(rngs[1], ids0)["params"]
        dv, dm = self.vision_config.hidden_size, self.llm_config.d_model
        self.projector = np.asarray(
            jax.random.normal(rngs[2], (dv, dm)) / np.sqrt(dv), np.float32)
        if model_path:
            self._load_weights(model_path)

        import jax.numpy as jnp

        def step(v_params, l_params, proj, pixels, ids, mask):
            feats = self.vision.apply({"params": v_params}, pixels)
            patches = feats["last_hidden_state"][:, 1:]  # drop CLS
            prefix = jnp.einsum("bpd,dm->bpm", patches.astype(jnp.float32), proj)
            logits = self.llm.apply({"params": l_params}, ids, mask,
                                    prefix_embeds=prefix, return_logits=True)
            return logits[:, -1].argmax(axis=-1)

        self._step = jax.jit(step)

    def _load_weights(self, path: str):
        from ai_toolkit_tpu.io.flux_import import _merge_imported
        from ai_toolkit_tpu.io.sd_import import clip_vision_rules, llm_rules
        from ai_toolkit_tpu.io.torch_import import load_safetensors_dir, torch_to_tree

        vt = os.path.join(path, "vision_tower")
        if os.path.isdir(vt):
            flat = load_safetensors_dir(vt)
            tree, _ = torch_to_tree(flat, clip_vision_rules())
            self.v_params = _merge_imported(self.v_params, tree, "vlm vision tower")
        lm = os.path.join(path, "language_model")
        if os.path.isdir(lm):
            flat = load_safetensors_dir(lm)
            tree, _ = torch_to_tree(flat, llm_rules())
            self.l_params = _merge_imported(self.l_params, tree, "vlm language model")
        pj = os.path.join(path, "projector.safetensors")
        if os.path.isfile(pj):
            import safetensors.numpy as stnp

            w = stnp.load_file(pj)
            k = w.get("kernel", w.get("weight"))
            if k is not None:
                self.projector = np.asarray(k.T if k.shape[0] == self.projector.shape[1]
                                            else k, np.float32)

    def _pixels(self, path: str) -> np.ndarray:
        from PIL import Image

        s = self.vision_config.image_size
        img = Image.open(path).convert("RGB").resize((s, s))
        arr = np.asarray(img, np.float32) / 255.0
        mean = np.array([0.4815, 0.4578, 0.4082], np.float32)
        std = np.array([0.2686, 0.2613, 0.2758], np.float32)
        return ((arr - mean) / std)[None]

    def caption(self, image_path: str) -> str:
        import jax.numpy as jnp

        pixels = jnp.asarray(self._pixels(image_path))
        prompt_ids = [int(i) for i in self.tokenizer.encode(self.prompt)]
        if self.tokenizer.eos_id in prompt_ids:
            prompt_ids = prompt_ids[: prompt_ids.index(self.tokenizer.eos_id)]
        ids = list(prompt_ids)
        new: list[int] = []
        for _ in range(self.max_new_tokens):
            arr = np.asarray(ids, np.int32)[None]
            mask = np.ones_like(arr)
            nxt = int(self._step(self.v_params, self.l_params, self.projector,
                                 pixels, jnp.asarray(arr), jnp.asarray(mask))[0])
            if nxt == self.tokenizer.eos_id:
                break
            new.append(nxt)
            ids.append(nxt)
        return self.tokenizer.decode(np.asarray(new, np.int32)).strip()
