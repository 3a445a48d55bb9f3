"""Minimal local-LLM text generation (greedy) for tool scripts.

Loads an HF-layout causal-LM directory (config.json + safetensors + a local
tokenizer) through the shared ``llm_rules`` importer into ``LLMEncoder`` and
greedy-decodes with the tied-embedding head — the same machinery the VLM
captioner uses, text-only. Serves the Ideogram-4 prompt upsampler
(``ui_scripts/upsample_ideogram4_caption.py``; the reference runs Qwen3-VL
there, which is only reachable offline via local weights anyway).
"""

from __future__ import annotations

import json
import os

import numpy as np


def generate_text(model_dir: str, prompt: str, max_new_tokens: int = 256,
                  seed: int = 0) -> str:
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules
    from ai_toolkit_tpu.io.torch_import import load_safetensors_dir, torch_to_tree
    from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
    from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.isfile(cfg_path):
        hf = json.load(open(cfg_path))
        hf = hf.get("text_config", hf)
        cfg = LLMConfig(
            vocab_size=hf.get("vocab_size", 128256),
            d_model=hf.get("hidden_size", 4096),
            n_layers=hf.get("num_hidden_layers", 32),
            n_heads=hf.get("num_attention_heads", 32),
            n_kv_heads=hf.get("num_key_value_heads", 8),
            head_dim=hf.get("head_dim",
                            hf.get("hidden_size", 4096)
                            // hf.get("num_attention_heads", 32)),
            d_ff=hf.get("intermediate_size", 14336),
            rope_theta=hf.get("rope_theta", 500_000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-5),
            qkv_bias=bool(hf.get("attention_bias", False)),
            qk_head_norm=hf.get("model_type", "") in ("qwen3", "qwen3_vl"),
        )
    else:
        cfg = LLMConfig.tiny(d_model=64)
    llm = LLMEncoder(cfg)
    tokenizer = load_tokenizer(model_dir, "tokenizer", vocab_size=cfg.vocab_size,
                               eos_id=2, max_len=4096)

    params = llm.init(jax.random.key(seed), np.zeros((1, 8), np.int32))["params"]
    flat = load_safetensors_dir(model_dir)
    if flat:
        tree, _ = torch_to_tree(flat, llm_rules())
        params = _merge_imported(params, tree, "llm_generate model")

    @jax.jit
    def next_token(params, ids):
        logits = llm.apply({"params": params}, ids, return_logits=True)
        return logits[:, -1].argmax(axis=-1)

    ids = list(tokenizer.encode(prompt))
    # strip right-padding so decode continues from the real prompt tail
    while len(ids) > 1 and ids[-1] == 0:
        ids.pop()
    out_ids: list[int] = []
    for _ in range(max_new_tokens):
        nxt = int(next_token(params, np.asarray([ids], np.int32))[0])
        if nxt == tokenizer.eos_id:
            break
        out_ids.append(nxt)
        ids.append(nxt)
    decode = getattr(tokenizer, "decode", None)
    if decode is not None:
        return decode(out_ids)
    return " ".join(str(i) for i in out_ids)
