"""Orbax checkpointing: save/restore full training state + config.

Replaces the reference's two Lightning ``ModelCheckpoint`` callbacks
(top-k on train_loss + save_last, ``model_train_inference.py:199-238``) and
its ctime-based discovery (``unconditional/utils.py:15-22``) with an orbax
``CheckpointManager``: atomic async saves of
``{params, ema_params, opt_state, step}``, best-k retention on ``train_loss``,
and exact resume.  The experiment config is serialised alongside, so a
checkpoint reconstructs its architecture (the reference relies on Lightning's
``save_hyperparameters`` for this, ``:307``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper around ``ocp.CheckpointManager`` for TrainState pytrees."""

    def __init__(
        self,
        directory: str,
        config: Optional[ExperimentConfig] = None,
        *,
        max_to_keep: int = 3,
        keep_best_on: Optional[str] = "train_loss",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[keep_best_on]) if keep_best_on else None,
            # orbax rejects an explicit best_mode=None (its validator only
            # admits 'min'/'max' despite the error message); unused w/o best_fn
            best_mode="min",
            keep_checkpoints_without_metrics=True,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        if config is not None and jax.process_index() == 0:
            # host-side JSON, not orbax-coordinated: primary-only to avoid a
            # multi-process write race on shared storage (orbax saves below
            # must NOT be gated this way — every process participates)
            cfg_path = os.path.join(self.directory, "config.json")
            if not os.path.exists(cfg_path):
                with open(cfg_path, "w") as f:
                    f.write(config.to_json())

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def load_config(self) -> Optional[ExperimentConfig]:
        cfg_path = os.path.join(self.directory, "config.json")
        if not os.path.exists(cfg_path):
            return None
        with open(cfg_path) as f:
            return ExperimentConfig.from_json(f.read())


def find_latest_checkpoint(directory: str) -> Optional[int]:
    """Latest step in an orbax checkpoint dir (reference ``find_latest_checkpoint``)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None
