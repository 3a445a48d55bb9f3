"""LoRA rescale job (reference ModRescaleLoraProcess,
``/root/reference/jobs/process/ModRescaleLoraProcess.py:1-104``): load a LoRA
safetensors, multiply its effective weight by ``new_multiplier`` (folded into
the up factors / alpha), save with refreshed metadata."""

from __future__ import annotations

import math
import os

import numpy as np

from ai_toolkit_tpu.config.modules import ProcessConfig


class ModRescaleLoraProcess:
    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        from safetensors import safe_open
        from safetensors.numpy import save_file

        ex = self.cfg.extras
        in_path = ex["input_path"]
        out_path = ex.get(
            "output_path",
            os.path.join(self.cfg.training_folder, f"{self.job_name}_rescaled.safetensors"),
        )
        scale = float(ex.get("new_multiplier", ex.get("scale", 1.0)))
        scale_target = ex.get("scale_target", "up_weight")  # up_weight | alpha

        flat, meta = {}, {}
        with safe_open(in_path, framework="numpy") as f:
            meta = dict(f.metadata() or {})
            for k in f.keys():
                flat[k] = f.get_tensor(k)

        out = {}
        for k, v in flat.items():
            if scale_target == "alpha" and k.endswith(".alpha"):
                out[k] = (v.astype(np.float64) * scale).astype(v.dtype)
            elif scale_target == "up_weight" and (
                k.endswith(".lora_up.weight") or k.endswith(".lora_B.weight")
            ):
                out[k] = (v.astype(np.float64) * scale).astype(v.dtype)
            else:
                out[k] = v
        meta["rescaled_by"] = str(scale)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        save_file(out, out_path, metadata={k: str(v) for k, v in meta.items()})
        return {"output": out_path, "scale": scale}
