"""LoRA extraction job (reference ExtractJob / ExtractLoraProcess)."""

from __future__ import annotations

import os

import jax
import numpy as np

from ai_toolkit_tpu.adapters.extract import extract_lora_from_diff
from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.io.lora_file import save_lora_file


class ExtractLoraProcess:
    """Config: extras {base_weights, tuned_weights, rank, alpha, output_path} —
    flat component safetensors in, lora safetensors out."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        from safetensors.numpy import load_file

        ex = self.cfg.extras
        base = _unflatten(load_file(ex["base_weights"]))
        tuned = _unflatten(load_file(ex["tuned_weights"]))
        rank = int(ex.get("rank", self.cfg.network.rank if self.cfg.network else 16))
        lora = extract_lora_from_diff(base, tuned, rank=rank, alpha=ex.get("alpha"))
        out = ex.get(
            "output_path",
            os.path.join(self.cfg.training_folder, f"{self.job_name}_extracted.safetensors"),
        )
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_lora_file(lora, out, fmt=ex.get("format", "kohya"),
                       prefix=ex.get("prefix", "lora_transformer"),
                       metadata={"extracted": "true", "rank": rank})
        return {"output": out, "modules": len(lora)}


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree
