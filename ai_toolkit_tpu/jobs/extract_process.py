"""LoRA extraction job (reference ExtractJob / ExtractLoraProcess).

Two input modes:
- **Full model checkpoints** (reference contract, ``jobs/ExtractJob.py:16-52``:
  ``base_model`` + ``extract_model`` paths — HF-layout dirs or LDM single
  files, anything the arch importer reads) — the diff of the main diffusion
  component is SVD'd into a LoRA saved in the model's own export key layout.
- Pre-flattened component safetensors (``base_weights``/``tuned_weights``) —
  the original minimal path, kept for scripted use.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ai_toolkit_tpu.adapters.extract import extract_lora_from_diff
from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.io.lora_file import save_lora_file


class ExtractLoraProcess:
    """Config extras: {base_model, extract_model, arch} (full checkpoints) or
    {base_weights, tuned_weights} (flat component safetensors), plus
    {rank, alpha, output_path, format, prefix}."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        ex = self.cfg.extras
        rank = int(ex.get("rank", self.cfg.network.rank if self.cfg.network else 16))
        key_map = None
        fmt = ex.get("format")
        prefix = ex.get("prefix")
        model = None
        if "base_model" in ex or "extract_model" in ex:
            if not ("base_model" in ex and "extract_model" in ex):
                raise ValueError("extract needs BOTH base_model and extract_model")
            base, tuned, model = self._load_pair(ex)
        else:
            from safetensors.numpy import load_file

            base = _unflatten(load_file(ex["base_weights"]))
            tuned = _unflatten(load_file(ex["tuned_weights"]))
        lora = extract_lora_from_diff(base, tuned, rank=rank, alpha=ex.get("alpha"))
        if model is not None:
            from ai_toolkit_tpu.jobs.train_process import SDTrainProcess

            key_map = SDTrainProcess._key_map(model, lora)
            auto_fmt, auto_prefix = self._export_layout(model)
            fmt = fmt or auto_fmt
            prefix = prefix or auto_prefix
        out = ex.get(
            "output_path",
            os.path.join(self.cfg.training_folder, f"{self.job_name}_extracted.safetensors"),
        )
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_lora_file(lora, out, key_map=key_map, fmt=fmt or "kohya",
                       prefix=prefix or "lora_transformer",
                       metadata={"extracted": "true", "rank": rank})
        return {"output": out, "modules": _count_modules(lora)}

    def _load_pair(self, ex):
        """Load base and tuned full checkpoints through the arch importer and
        return the two main-component param trees (numpy, host-side)."""
        from ai_toolkit_tpu.config.modules import ModelConfig
        from ai_toolkit_tpu.models.registry import get_model_class

        arch = ex.get("arch") or (self.cfg.model.arch if self.cfg.model else "sd1")
        kwargs = dict(ex.get("model_kwargs", {}))
        trees = []
        model = None
        for path in (ex["base_model"], ex["extract_model"]):
            mc = ModelConfig.from_dict(
                {"arch": arch, "name_or_path": str(path), "model_kwargs": kwargs}
            )
            model = get_model_class(arch)(mc)
            variables = model.load_variables(jax.random.key(0))
            main = _main_component(variables)
            trees.append(jax.tree.map(np.asarray, variables[main]))
            del variables
        return trees[0], trees[1], model

    @staticmethod
    def _export_layout(model):
        layout = model.lora_key_layout()
        if layout != "kohya":
            fmt = layout
        else:
            fmt = "peft" if model.is_flow_matching else "kohya"
        prefix = "lora_transformer" if model.is_flow_matching else "lora_unet"
        return fmt, prefix


def _main_component(variables: dict) -> str:
    for k in ("dit", "unet", "transformer"):
        if k in variables:
            return k
    return next(iter(variables))


def _count_modules(lora: dict) -> int:
    n = 0
    for _, v in lora.items():
        if isinstance(v, dict) and {"a", "b"} <= set(v.keys()):
            n += 1
        elif isinstance(v, dict):
            n += _count_modules(v)
    return n


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree
