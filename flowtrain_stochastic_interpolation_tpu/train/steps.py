"""Jitted train/eval step factories.

One compiled SPMD program per training step: loss + grad + optax update +
EMA shadow, with the batch sharded over the ``data`` mesh axis and gradients
all-reduced by XLA (the DDP replacement — SURVEY.md §2.6).  Buffer donation
keeps params/opt-state updates in-place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.train.objectives import (
    conditional_loss,
    unconditional_loss,
)
from flowtrain_stochastic_interpolation_tpu.train.state import (
    TrainState,
    ema_update,
)


def make_apply_fn(model, conditional: bool) -> Callable:
    """Wrap ``model.apply`` so losses can pass a bare params tree.

    The ``constants`` collection (frozen fourier features, if any) rides along
    via closure-free threading: it lives in ``state.constants["model"]``.
    """

    def apply_fn(params, model_constants, *args, deterministic=True, rngs=None):
        variables = {"params": params}
        if model_constants:
            variables["constants"] = model_constants
        return model.apply(variables, *args, deterministic=deterministic, rngs=rngs)

    return apply_fn


def remat_policy(tc, conditional: bool):
    """Checkpoint policy for full-forward rematerialisation.

    Base: keep contraction results without batch dims (time-MLP weights-side
    dots).  Conditional models additionally save the EmbedATb tower tensors
    (``checkpoint_name("atb_tower")`` in ``models/unet_cond.py``) so backward
    never re-runs the k=5 convs whose lowering temp pads 2.7× on the TPU tile
    grid (docs/roofline.md "EmbedATb conv5 remat temp").
    """
    if getattr(tc, "remat_policy", "dots") == "nothing":
        # minimum-HBM form: recompute everything in the backward.  At 128³
        # the "dots" policy's saved qkv projections are 1.5 GB per full-res
        # attention stage — the difference between fitting on one chip or not.
        policy = jax.checkpoint_policies.nothing_saveable
    else:
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if conditional and tc.remat_save_atb:
        policy = jax.checkpoint_policies.save_from_both_policies(
            policy,
            jax.checkpoint_policies.save_only_these_names("atb_tower"),
        )
    return policy


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config: ExperimentConfig,
):
    """Build ``train_step(state, batch, key) -> (state, metrics)`` (jitted).

    ``batch`` is the categorical volume ``[B, X, Y, Z]`` (air = -1); data
    embedding, interpolation draw, masking (conditional), loss, and optimiser
    all run inside the single compiled program.
    """
    conditional = config.model.conditional
    interpolant = LinearInterpolant(one_sided=True)
    tc = config.training
    apply_raw = make_apply_fn(model, conditional)

    def loss_for(params, constants, batch, key):
        model_constants = constants.get("model", {})

        def apply_fn(p, *args, deterministic=True, rngs=None):
            if tc.remat:
                # full-forward rematerialisation: backward recomputes the UNet
                # instead of keeping ~57 conv activations at 64³ in HBM
                # (jax.checkpoint — SURVEY.md build brief, HBM-bandwidth notes)
                fwd = jax.checkpoint(
                    lambda p_, *a: apply_raw(
                        p_, model_constants, *a, deterministic=deterministic, rngs=rngs
                    ),
                    policy=remat_policy(tc, conditional),
                )
                return fwd(p, *args)
            return apply_raw(p, model_constants, *args, deterministic=deterministic, rngs=rngs)

        obj_dtype = (
            jnp.bfloat16
            if getattr(tc, "objective_dtype", "float32") == "bfloat16"
            else None
        )
        if conditional:
            return conditional_loss(
                apply_fn, params, constants, batch, key,
                interpolant=interpolant, time_range=tc.time_range,
                x1_noise=tc.x1_noise, lambda_reconstruct=tc.lambda_reconstruct,
                objective_dtype=obj_dtype,
            )
        return unconditional_loss(
            apply_fn, params, constants, batch, key,
            interpolant=interpolant, time_range=tc.time_range,
            x1_noise=tc.x1_noise, objective_dtype=obj_dtype,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Array, key: Array):
        key = jax.random.fold_in(key, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_for(p, state.constants, batch, key), has_aux=True
        )(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(config.ema, state.step, state.ema_params, params)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, metrics

    return train_step


def make_eval_loss(model, config: ExperimentConfig):
    """Deterministic loss (no dropout/optimiser) for validation sweeps."""
    conditional = config.model.conditional
    interpolant = LinearInterpolant(one_sided=True)
    tc = config.training
    apply_raw = make_apply_fn(model, conditional)

    @jax.jit
    def eval_loss(state: TrainState, batch: Array, key: Array):
        model_constants = state.constants.get("model", {})

        def apply_fn(p, *args, deterministic=True, rngs=None):
            return apply_raw(p, model_constants, *args, deterministic=True)

        fn = conditional_loss if conditional else unconditional_loss
        kwargs = dict(
            interpolant=interpolant, time_range=tc.time_range,
            x1_noise=tc.x1_noise, train=False,
        )
        if conditional:
            kwargs["lambda_reconstruct"] = tc.lambda_reconstruct
        _, metrics = fn(apply_fn, state.params, state.constants, batch, key, **kwargs)
        return metrics

    return eval_loss
