"""Example user extension — the template the reference ships as
``extensions_built_in/example/`` (``ExampleMergeModels`` with a documented
config block; ``example_model/example_model.py`` for custom archs).

Drop a module like this into ``extensions/`` (or any dir on
``AIT_EXTENSIONS_DIR``) exposing ``AI_TOOLKIT_EXTENSIONS``; the ``uid`` is
the config ``type:`` string. A module may also register custom architectures
at import time via ``ai_toolkit_tpu.models.registry.register_model``.

Run it with:

    job: extension
    config:
      name: my_example
      process:
        - type: example_average_weights
          weight_paths: [a.safetensors, b.safetensors]
          output_path: averaged.safetensors
"""

from __future__ import annotations

from ai_toolkit_tpu.jobs.extensions import Extension


class _AverageWeightsProcess:
    """Tiny but REAL process: weight-space average of N FULL state-dict
    safetensors files (the reference's example merges models the same way).

    NOTE this is only meaningful for full weights — averaging LoRA FACTORS
    leaf-by-leaf is wrong (mean(A) @ mean(B) != mean(A @ B)); merge LoRAs
    into their bases first (scripts/make_lcm_model.py) and average those."""

    def __init__(self, job_name: str, cfg):
        self.job_name = job_name
        raw = cfg.extras if hasattr(cfg, "extras") else dict(cfg)
        self.weight_paths = list(raw.get("weight_paths",
                                         raw.get("lora_paths", [])))
        self.output_path = raw.get("output_path")
        if len(self.weight_paths) < 2 or not self.output_path:
            raise ValueError(
                "example_average_weights needs weight_paths (>=2) and output_path")

    def run(self):
        import numpy as np
        from safetensors.numpy import load_file, save_file

        flats = [load_file(p) for p in self.weight_paths]
        keys = set(flats[0])
        for f in flats[1:]:
            keys &= set(f)
        dropped = sorted(set().union(*[set(f) for f in flats]) - keys)
        if dropped:
            # loud-no-op stance: a silently missing module is worse than noise
            print(f"WARNING: {len(dropped)} keys not present in every input "
                  f"are DROPPED, e.g. {dropped[:3]}")
        if any(".lora_down." in k or ".lora_A." in k for k in keys):
            print("WARNING: inputs look like LoRA FACTOR files — a leaf-wise "
                  "factor average does NOT average the adapters; merge into "
                  "bases first")
        out = {k: np.mean([np.asarray(f[k], np.float32) for f in flats], axis=0)
               for k in sorted(keys)}
        save_file(out, self.output_path)
        print(f"averaged {len(self.weight_paths)} files -> {self.output_path} "
              f"({len(out)} keys)")
        return {"keys": len(out), "output": self.output_path, "dropped": len(dropped)}


class ExampleAverageWeights(Extension):
    name = "Example: average model weights"
    uid = "example_average_weights"

    @classmethod
    def get_process(cls):
        return _AverageWeightsProcess


AI_TOOLKIT_EXTENSIONS = [ExampleAverageWeights]
