"""LoRA merge job (reference MergeLoconProcess / merge utilities):
load base component weights + a LoRA file, merge, save full weights."""

from __future__ import annotations

import os

import jax
import numpy as np

from ai_toolkit_tpu.adapters.lora import merge_lora
from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.io.lora_file import load_lora_file
from ai_toolkit_tpu.models.registry import get_model_class


class MergeLoraProcess:
    """extras: {lora_path, multiplier, output_path} + model.arch/name_or_path."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        from safetensors.numpy import save_file

        from ai_toolkit_tpu.jobs.train_process import SDTrainProcess, _flatten_params

        cfg = self.cfg
        ex = cfg.extras
        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(0))
        main = SDTrainProcess._main_component(variables)

        # inverse map via the model's key map over its own params
        key_map = SDTrainProcess._key_map(model, variables[main])
        if model.is_flow_matching and hasattr(model, "dit_config"):
            from ai_toolkit_tpu.models.flux_dit import flux_inverse_key_map

            inverse = flux_inverse_key_map(
                key_map, model.dit_config.depth_double, model.dit_config.depth_single
            )
        else:
            inverse = {v: k for k, v in key_map.items()}
            inverse.update({v.replace(".", "_"): k for k, v in key_map.items()})

        lora, meta = load_lora_file(ex["lora_path"], inverse)
        mult = float(ex.get("multiplier", 1.0))
        merged = merge_lora(variables[main], lora, multiplier=mult)
        out = ex.get(
            "output_path",
            os.path.join(cfg.training_folder, f"{self.job_name}_merged.safetensors"),
        )
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_file(
            _flatten_params(jax.tree.map(np.asarray, merged)), out,
            metadata={"merged_lora": ex["lora_path"], "multiplier": str(mult)},
        )
        return {"output": out}
