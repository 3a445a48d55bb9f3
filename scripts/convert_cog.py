"""Convert a cog/replicate-trained SDXL LoRA + textual-inversion embedding to
kohya (LDM-module-key) layout.

Analog of reference ``scripts/convert_cog.py``: cog's SDXL trainer saves the
UNet LoRA with old-diffusers attn-processor keys
(``down_blocks.1.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.down.weight``)
and the embedding with ``text_encoders_0`` / ``text_encoders_1`` entries. The
kohya layout wants ``lora_unet_<ldm_module_path>.lora_down.weight`` (+ a
per-module ``.alpha`` = rank) and ``clip_l`` / ``clip_g``.

The reference script resolves diffusers->LDM module names through a
``stable_diffusion_locon_sdxl.json`` keymap that is absent from its own tree
(the script crashes as shipped); we derive the LDM names structurally via
``io.ldm_single_file.unet_diffusers_to_ldm_key`` instead, so no keymap file
is needed.

Usage:
  python scripts/convert_cog.py lora.safetensors embeddings.pti \
      --lora_output out_lora.safetensors --embedding_output out_emb.safetensors
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safetensors.numpy import load_file, save_file

from ai_toolkit_tpu.io.ldm_single_file import unet_diffusers_to_ldm_key

EMBEDDING_MAPPING = {"text_encoders_0": "clip_l", "text_encoders_1": "clip_g"}

# old attn-processor suffix -> (diffusers module leaf, kohya leaf)
_SUFFIXES = [
    (re.compile(r"\.processor\.(to_[qkv])_lora\.(down|up)\.weight$"),
     lambda m: (m.group(1), f"lora_{m.group(2)}.weight")),
    (re.compile(r"\.processor\.to_out_lora\.(down|up)\.weight$"),
     lambda m: ("to_out.0", f"lora_{m.group(1)}.weight")),
    # newer peft-style naming, for forks that re-saved with lora_A/lora_B
    (re.compile(r"\.(to_[qkv]|to_out\.0)\.lora_(A|B)\.weight$"),
     lambda m: (m.group(1), f"lora_{'down' if m.group(2) == 'A' else 'up'}.weight")),
]


def cog_key_to_kohya(key: str) -> str | None:
    """One cog LoRA key -> kohya key, or None for non-LoRA entries."""
    key = key.removeprefix("unet.")
    for pat, fn in _SUFFIXES:
        m = pat.search(key)
        if m is None:
            continue
        leaf, kohya_leaf = fn(m)
        module = key[: m.start()] + "." + leaf
        # treat the module path as a param key so the structural mapper
        # accepts it, then strip the fake leaf again
        ldm = unet_diffusers_to_ldm_key(module + ".weight")
        if ldm is None:
            raise KeyError(f"unmapped UNet module for key {key!r}")
        ldm_module = ldm[: -len(".weight")]
        return f"lora_unet_{ldm_module.replace('.', '_')}.{kohya_leaf}"
    return None


def convert_cog(lora_sd: dict[str, np.ndarray],
                emb_sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    out_lora: dict[str, np.ndarray] = {}
    for key, tensor in lora_sd.items():
        new_key = cog_key_to_kohya(key)
        if new_key is None:
            raise KeyError(f"unrecognized cog LoRA key {key!r}")
        out_lora[new_key] = np.ascontiguousarray(tensor)
        if new_key.endswith(".lora_down.weight"):
            # diffusers has no alpha (implicit alpha == rank)
            rank = int(min(tensor.shape)) if tensor.ndim >= 2 else int(tensor.shape[0])
            out_lora[new_key.replace(".lora_down.weight", ".alpha")] = np.full(
                (1,), float(rank), dtype=tensor.dtype)
    out_emb = {EMBEDDING_MAPPING.get(k, k): np.ascontiguousarray(v)
               for k, v in emb_sd.items()}
    return out_lora, out_emb


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("lora_path")
    p.add_argument("embedding_path")
    p.add_argument("--lora_output", default="lora_converted.safetensors")
    p.add_argument("--embedding_output", default="embedding_converted.safetensors")
    args = p.parse_args()

    out_lora, out_emb = convert_cog(load_file(args.lora_path),
                                    load_file(args.embedding_path))
    save_file(out_lora, args.lora_output)
    save_file(out_emb, args.embedding_output)
    print(f"Saved lora to {args.lora_output} ({len(out_lora)} tensors)")
    print(f"Saved embedding to {args.embedding_output} ({len(out_emb)} tensors)")


if __name__ == "__main__":
    main()
