"""Run loggers: console + tensorboard + optional wandb + UI sqlite hook.

Reference: ``create_logger`` (``/root/reference/toolkit/logging_aitk.py:13-100``)
and the tensorboard writer in ``BaseTrainProcess``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from ai_toolkit_tpu.config.modules import LoggingConfig


class RunLogger:
    def __init__(self, cfg: LoggingConfig, run_dir: str, job_name: str):
        self.cfg = cfg
        self.run_dir = run_dir
        self.job_name = job_name
        self.tb = None
        self.wandb = None
        self._jsonl = None
        os.makedirs(run_dir, exist_ok=True)
        if cfg.use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self.tb = None
        if cfg.use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=cfg.project_name, name=cfg.run_name or job_name, dir=run_dir
                )
            except Exception:
                self.wandb = None
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def log(self, metrics: dict[str, Any], step: int) -> None:
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)
        self._jsonl.write(json.dumps({"step": step, "t": time.time(), **scalars}) + "\n")
        self._jsonl.flush()

    def log_image(self, img, name: str, step: int) -> None:
        if self.tb is not None:
            import numpy as np

            self.tb.add_image(name, np.asarray(img).transpose(2, 0, 1), step)

    def finish(self) -> None:
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()
        if self._jsonl:
            self._jsonl.close()
