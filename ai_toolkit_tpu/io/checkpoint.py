"""Checkpoint save / resume / rotation.

Behavior parity with the reference's save machinery
(``/root/reference/jobs/process/BaseSDTrainProcess.py:498-717``): zero-padded
step suffix naming (``<name>_000000250.safetensors``), training state (step)
embedded in safetensors metadata and restored on resume
(``load_training_state_from_metadata:860``), rotation keeping
``max_step_saves_to_keep``, one optimizer-state file per run
(``optimizer.pt`` -> ``optimizer.msgpack`` via flax.serialization).
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import numpy as np

from ai_toolkit_tpu.io.lora_file import load_lora_file, save_lora_file

SOFTWARE_META = {"software": "ai_toolkit_tpu", "format": "lora"}


class CheckpointManager:
    def __init__(
        self,
        save_root: str,
        name: str,
        max_step_saves_to_keep: int = 4,
        fmt: str = "kohya",
        prefix: str = "lora_transformer",
        key_map: dict | None = None,
        dtype=np.float16,
    ):
        self.save_root = save_root
        self.name = name
        self.max_keep = max_step_saves_to_keep
        self.fmt = fmt
        self.prefix = prefix
        self.key_map = key_map
        self.dtype = dtype
        os.makedirs(save_root, exist_ok=True)

    # ---- naming ----

    def path_for_step(self, step: int) -> str:
        return os.path.join(self.save_root, f"{self.name}_{step:09d}.safetensors")

    def final_path(self) -> str:
        return os.path.join(self.save_root, f"{self.name}.safetensors")

    def optimizer_path(self) -> str:
        return os.path.join(self.save_root, "optimizer.msgpack")

    def latest_save_path(self) -> str | None:
        """Newest step-suffixed save (reference get_latest_save_path:816)."""
        pattern = os.path.join(self.save_root, f"{self.name}_*.safetensors")
        files = glob.glob(pattern)
        step_files = []
        for f in files:
            m = re.search(rf"{re.escape(self.name)}_(\d+)\.safetensors$", f)
            if m:
                step_files.append((int(m.group(1)), f))
        if step_files:
            return max(step_files)[1]
        final = self.final_path()
        return final if os.path.isfile(final) else None

    # ---- save ----

    def save(
        self,
        lora: dict,
        step: int,
        opt_state=None,
        ema=None,
        extra_meta: dict | None = None,
        final: bool = False,
        extra_flat: dict | None = None,
    ) -> str:
        meta = dict(SOFTWARE_META)
        meta["ss_training_comment"] = self.name
        meta["step"] = str(int(step))
        meta["timestamp"] = str(int(time.time()))
        meta.update(extra_meta or {})
        path = self.final_path() if final else self.path_for_step(step)
        save_lora_file(
            lora, path, key_map=self.key_map, fmt=self.fmt, prefix=self.prefix,
            metadata=meta, dtype=self.dtype, extra_flat=extra_flat,
        )
        if opt_state is not None:
            self._save_opt_state(opt_state, ema, step)
        if not final:
            self.clean_up_saves()
        return path

    def _save_opt_state(self, opt_state, ema, step: int):
        from flax import serialization

        payload = {"opt_state": opt_state, "ema": ema, "step": np.int64(step)}
        blob = serialization.to_bytes(payload)
        tmp = self.optimizer_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, self.optimizer_path())

    def clean_up_saves(self):
        """Keep only the newest max_keep step saves (reference clean_up_saves:411)."""
        pattern = os.path.join(self.save_root, f"{self.name}_*.safetensors")
        step_files = []
        for f in glob.glob(pattern):
            m = re.search(rf"{re.escape(self.name)}_(\d+)\.safetensors$", f)
            if m:
                step_files.append((int(m.group(1)), f))
        step_files.sort()
        for _, f in step_files[: -self.max_keep] if self.max_keep > 0 else []:
            os.remove(f)

    # ---- resume ----

    def load_latest(self, inverse_key_map=None) -> tuple[dict | None, int]:
        """Returns (lora_tree | None, step)."""
        path = self.latest_save_path()
        if path is None:
            return None, 0
        lora, meta = load_lora_file(path, inverse_key_map)
        step = int(meta.get("step", 0))
        return lora, step

    def load_latest_split(
        self, inverse_key_map=None, te_inverse_maps: dict | None = None
    ) -> tuple[dict | None, dict, int]:
        """Returns (lora_tree | None, {te_collection: tree}, step) — TE LoRA
        entries (train_text_encoder) restored into their own collections."""
        from ai_toolkit_tpu.io.lora_file import load_lora_file_split

        path = self.latest_save_path()
        if path is None:
            return None, {}, 0
        lora, te_trees, meta = load_lora_file_split(path, inverse_key_map, te_inverse_maps)
        return lora, te_trees, int(meta.get("step", 0))

    def load_opt_state(self, template) -> tuple[object | None, object | None, int]:
        """Restore optimizer state against a template pytree (shape-checked).

        Returns (opt_state, ema, step) or (None, None, 0) on mismatch — the
        reference also skips the optimizer if the network shape changed
        (BaseSDTrainProcess.py:2193-2198).
        """
        from flax import serialization

        p = self.optimizer_path()
        if not os.path.isfile(p):
            return None, None, 0
        try:
            payload = serialization.from_bytes(template, open(p, "rb").read())
            return payload["opt_state"], payload["ema"], int(payload["step"])
        except Exception:
            return None, None, 0
