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
        - type: example_average_loras
          lora_paths: [a.safetensors, b.safetensors]
          output_path: averaged.safetensors
"""

from __future__ import annotations

from ai_toolkit_tpu.jobs.extensions import Extension


class _AverageLorasProcess:
    """Tiny but REAL process: average N LoRA files leaf-by-leaf (the
    reference's example merges models at configurable weights)."""

    def __init__(self, job_name: str, cfg):
        self.job_name = job_name
        raw = cfg.extras if hasattr(cfg, "extras") else dict(cfg)
        self.lora_paths = list(raw.get("lora_paths", []))
        self.output_path = raw.get("output_path")
        if len(self.lora_paths) < 2 or not self.output_path:
            raise ValueError(
                "example_average_loras needs lora_paths (>=2) and output_path")

    def run(self):
        import numpy as np
        from safetensors.numpy import load_file, save_file

        flats = [load_file(p) for p in self.lora_paths]
        keys = set(flats[0])
        for f in flats[1:]:
            keys &= set(f)
        out = {k: np.mean([np.asarray(f[k], np.float32) for f in flats], axis=0)
               for k in sorted(keys)}
        save_file(out, self.output_path)
        print(f"averaged {len(self.lora_paths)} loras -> {self.output_path} "
              f"({len(out)} keys)")
        return {"keys": len(out), "output": self.output_path}


class ExampleAverageLoras(Extension):
    name = "Example: average LoRAs"
    uid = "example_average_loras"

    @classmethod
    def get_process(cls):
        return _AverageLorasProcess


AI_TOOLKIT_EXTENSIONS = [ExampleAverageLoras]
