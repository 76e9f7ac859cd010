"""Training state, optimiser chain, and EMA shadow tree.

Replaces the reference's Lightning plumbing with an optax chain (SURVEY.md
§2.5 row "Gradient clipping, accumulation, ExponentialLR, Adam/AdamW"):

* ``clip_by_global_norm`` ≙ ``Trainer(gradient_clip_val=...)``
* ``optax.MultiSteps``    ≙ ``accumulate_grad_batches`` (24 uncond / 4 cond)
* ``optax.exponential_decay`` (staircase, per-epoch) ≙ ``ExponentialLR``
* adam/adamw              ≙ ``configure_optimizers``
  (``model_train_inference.py:465-473``, ``model_train_sh_inference_cond.py:487-495``)
* EMA shadow tree         ≙ conditional ``EMACallback`` (``callbacks.py:219-317``)
  — kept on device: TPU HBM is the natural home, no CPU offload round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from flowtrain_stochastic_interpolation_tpu.config import EMAConfig, TrainingConfig


class TrainState(struct.PyTreeNode):
    """Pure pytree of everything a training step mutates."""

    step: jax.Array  # global micro-batch counter
    params: Any
    constants: Any  # frozen collections: embedding table, fourier constants
    opt_state: Any
    ema_params: Any  # EMA shadow tree; None when EMA is disabled

    def with_ema_applied(self) -> "TrainState":
        """Swap EMA weights in for inference (reference ``apply_ema_weights``)."""
        if self.ema_params is None:
            return self
        return self.replace(params=self.ema_params)


def make_optimizer(
    cfg: TrainingConfig, updates_per_epoch: int
) -> optax.GradientTransformation:
    """Build the optax chain mirroring the reference training recipe.

    ``updates_per_epoch`` is the number of *optimiser* updates per epoch
    (micro-batches / accumulation), so the staircase exponential decay fires
    exactly like torch's per-epoch ``ExponentialLR``.
    """
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=max(updates_per_epoch, 1),
        decay_rate=cfg.lr_decay,
        staircase=True,
    )
    if cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_val), opt)
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


def init_state(
    params: Any,
    constants: Any,
    tx: optax.GradientTransformation,
    ema: EMAConfig,
) -> TrainState:
    # NB: the shadow must be a distinct buffer — donated train steps may not
    # see the same buffer twice (params and ema_params both live in state).
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema.enabled else None,
    )


def ema_update(ema_cfg: EMAConfig, step: jax.Array, ema_params: Any, params: Any) -> Any:
    """Shadow update ``s = d*s + (1-d)*p`` gated by start_step/update_every.

    Matches the conditional ``EMACallback`` semantics
    (``callbacks.py:238-268``): before ``start_step`` the shadow tracks the
    raw weights; afterwards it decays every ``update_every`` steps.
    """
    if not ema_cfg.enabled or ema_params is None:
        return None
    d = ema_cfg.decay
    do_decay = (step >= ema_cfg.start_step) & (step % ema_cfg.update_every == 0)

    def upd(s, p):
        decayed = d * s + (1.0 - d) * p
        return jnp.where(do_decay, decayed, jnp.where(step < ema_cfg.start_step, p, s))

    return jax.tree.map(upd, ema_params, params)
