"""Explicit-collective data-parallel train step via ``shard_map`` + ``psum``.

The default train step (``train/steps.py``) lets XLA insert the gradient
all-reduce from sharding annotations.  This module is the explicit variant —
per-device gradient computation with a hand-placed ``lax.pmean`` over the
``data`` mesh axis riding ICI — the direct analogue of the reference's DDP
all-reduce (SURVEY.md §2.6 "comm backend" row), useful when the collective
schedule must be controlled manually (e.g. overlapping with backward).

Both variants produce identical replicated parameter updates; a CPU-mesh
equivalence test pins that down (tests/test_shard_map.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.train.objectives import (
    conditional_loss,
    unconditional_loss,
)
from flowtrain_stochastic_interpolation_tpu.train.state import TrainState, ema_update
from flowtrain_stochastic_interpolation_tpu.train.steps import make_apply_fn


def make_shard_map_train_step(model, tx, config: ExperimentConfig, mesh: Mesh):
    """Build a ``train_step(state, batch, key)`` with explicit psum gradients.

    ``batch`` must be sharded over ``data`` (leading axis divisible by the
    mesh size); params/opt state are replicated.  Each device draws its own
    noise (key folded with its mesh index), computes local grads, and the
    pmean over ICI makes every replica apply the identical update.
    """
    conditional = config.model.conditional
    interpolant = LinearInterpolant(one_sided=True)
    tc = config.training
    apply_raw = make_apply_fn(model, conditional)

    def local_loss(params, constants, batch, key):
        model_constants = constants.get("model", {})

        def apply_fn(p, *args, deterministic=True, rngs=None):
            return apply_raw(p, model_constants, *args,
                             deterministic=deterministic, rngs=rngs)

        kwargs = dict(interpolant=interpolant, time_range=tc.time_range,
                      x1_noise=tc.x1_noise)
        if conditional:
            return conditional_loss(
                apply_fn, params, constants, batch, key,
                lambda_reconstruct=tc.lambda_reconstruct, **kwargs,
            )
        return unconditional_loss(apply_fn, params, constants, batch, key, **kwargs)

    def per_device(state: TrainState, batch, key):
        # distinct noise per device, common optimiser trajectory
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        key = jax.random.fold_in(key, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: local_loss(p, state.constants, batch, key), has_aux=True
        )(state.params)

        # the DDP all-reduce, explicitly on the data axis (ICI collective)
        grads = jax.lax.pmean(grads, axis_name="data")
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "data"), metrics)
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(config.ema, state.step, state.ema_params, params)
        new_state = state.replace(
            step=state.step + 1, params=params,
            opt_state=opt_state, ema_params=ema_params,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
