"""Metric writers: CSV always, wandb when available.

Reference observability (SURVEY.md §5): WandbLogger + CSVLogger
(``model_train_sh_inference_cond.py:526-537``), per-step ``log_dict`` of
losses, LR per epoch, gradient norms.  Here one writer fans out to CSV and
(optionally) wandb; wandb is an optional dependency and silently disabled
when missing (matching ``WANDB_MODE=disabled``, ``:40``).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, out_dir: str, project: Optional[str] = None, use_wandb: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.csv_path = os.path.join(out_dir, "metrics.csv")
        self._file = open(self.csv_path, "a", newline="")
        self._writer = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=project or "flowtrain-tpu", resume="allow")
            except Exception:
                self._wandb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time(), **metrics}
        if self._writer is None:
            self._writer = csv.DictWriter(self._file, fieldnames=list(row.keys()), extrasaction="ignore")
            if self._file.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
