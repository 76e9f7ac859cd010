"""Metric writers: CSV always, wandb when available.

Reference observability (SURVEY.md §5): WandbLogger + CSVLogger
(``model_train_sh_inference_cond.py:526-537``), per-step ``log_dict`` of
losses, LR per epoch, gradient norms, and image artifacts (slice grids +
prominence maps) logged with a 3-retry I/O loop
(``callbacks.py:89-169``).  Here one writer fans out to CSV and (optionally)
wandb; wandb is an optional dependency and silently disabled when missing
(matching ``WANDB_MODE=disabled``, ``:40``).
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
        # resume: adopt the existing header so appended rows stay aligned
        self._fieldnames = None
        if os.path.getsize(self.csv_path) > 0:
            with open(self.csv_path, newline="") as f:
                first = f.readline().strip()
            if first:
                self._fieldnames = first.split(",")
                self._writer = csv.DictWriter(
                    self._file, fieldnames=self._fieldnames, extrasaction="ignore"
                )
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=project or "flowtrain-tpu", resume="allow")
            except Exception:
                self._wandb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time(), **metrics}
        new_keys = [k for k in row if k not in (self._fieldnames or [])]
        if new_keys:
            # expand the header in place: different callers log different
            # metric sets (e.g. the pre-train smoke logs time_to_solve before
            # the first train_loss row) and no column may be dropped
            self._fieldnames = (self._fieldnames or []) + new_keys
            self._rewrite_with_header()
        self._writer.writerow(row)
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def _rewrite_with_header(self) -> None:
        # Atomic header expansion: write the widened file to a temp path and
        # os.replace() it, so a crash mid-rewrite (common around periodic
        # inference, which introduces new columns) cannot lose the history.
        self._file.close()
        rows = []
        if os.path.exists(self.csv_path) and os.path.getsize(self.csv_path) > 0:
            with open(self.csv_path, newline="") as f:
                rows = list(csv.DictReader(f))
        tmp_path = self.csv_path + ".tmp"
        with open(tmp_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_path, self.csv_path)
        self._file = open(self.csv_path, "a", newline="")
        self._writer = csv.DictWriter(
            self._file, fieldnames=self._fieldnames, extrasaction="ignore"
        )

    def log_image(self, step: int, name: str, image_path: str, retries: int = 3) -> bool:
        """Log an image artifact (to wandb when active) with a retry loop.

        The reference wraps image logging in a 3-attempt loop against flaky
        filesystems (``callbacks.py:127-138``); same semantics here.  Returns
        True when the image was logged (or wandb is disabled and the file
        exists on disk, which is the CSV-only analogue of success).
        """
        for attempt in range(retries):
            try:
                if not os.path.exists(image_path):
                    raise FileNotFoundError(image_path)
                if self._wandb is not None:
                    import wandb  # type: ignore

                    self._wandb.log({name: wandb.Image(image_path)}, step=step)
                return True
            except Exception as exc:
                print(f"[MetricsWriter] image log attempt {attempt + 1}/{retries} "
                      f"failed for {name}: {exc}")
                time.sleep(0.5)
        return False

    def log_model(self, path: str, name: str = "model") -> None:
        """Persist a checkpoint as a wandb artifact (ref ``log_model=True``,
        ``model_train_inference.py:518-521``).  No-op without wandb."""
        if self._wandb is None:
            return
        try:
            import wandb  # type: ignore

            art = wandb.Artifact(name, type="model")
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._wandb.log_artifact(art)
        except Exception as exc:
            print(f"[MetricsWriter] log_model failed: {exc}")

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
