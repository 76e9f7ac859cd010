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
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.train.objectives import (
    conditional_loss,
    unconditional_loss,
)
from flowtrain_stochastic_interpolation_tpu.train.state import TrainState, ema_update
from flowtrain_stochastic_interpolation_tpu.train.steps import (
    make_apply_fn,
    remat_policy,
)


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


# ---------------------------------------------------------------------------
# Spatially-sharded training (beyond the reference)
# ---------------------------------------------------------------------------
#
# The reference never shards the voxel grid — its long-context strategy caps
# token counts with linear attention on one device
# (``/root/reference/src/flowtrain/models/unet_attn_3d.py:284-341,559-560``).
# Training >64³ volumes that exceed one chip's HBM needs the X axis of
# ``[B, X, Y, Z, C]`` sharded over a ``spatial`` mesh axis *through the
# backward pass*: the model runs with ``spatial_axis`` set (ppermute halo
# convs, ring attention, collective linear attention — ``parallel/spatial.py``),
# and the loss is assembled from cross-shard ``psum`` reductions so every
# device traces the exact global objective.  The 8 simultaneous per-device
# reverse passes interact through the transposed collectives, each producing
# n_devices× the global gradient's local view; a ``pmean`` over both mesh
# axes recovers the exact global gradient and makes the update identical on
# every replica (tests/test_shard_map.py::test_spatial_train_step_*).


def spatial_draws(key, labels, table, time_range, x1_noise, di, si):
    """Interpolation draws for one ``(data=di, spatial=si)`` shard.

    ``labels``: the shard's ``[B_loc, X_loc, Y, Z]`` categorical block.
    T is folded with ``di`` only — every spatial shard of a sample must see
    the same interpolation time; the x0/x1 noise fields are per-voxel iid, so
    folding ``(di, si)`` gives each slab an independent stream.  Module-level
    (not a closure) so tests can reconstruct the global draws shard by shard.
    """
    from flowtrain_stochastic_interpolation_tpu.ops.embedding import embed

    k_t = jax.random.fold_in(jax.random.fold_in(key, 17), di)
    k_n = jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(key, 23), di), si)
    k_x0 = jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(key, 29), di), si)

    x1_clean = embed(labels, table)  # [B_loc, X_loc, Y, Z, E]
    x1 = x1_clean + x1_noise * jax.random.normal(k_n, x1_clean.shape, x1_clean.dtype)
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    t = jax.random.uniform(
        k_t, (x1.shape[0],), x1.dtype, minval=time_range[0], maxval=time_range[1]
    )
    return x1_clean, x1, x0, t


def _make_spatial_loss(model, config: ExperimentConfig, mesh: Mesh):
    """Per-device loss closure computing the exact *global* objective.

    Every reduction in the reference objectives (``train/objectives.py``) is
    a mean or masked mean over the full batch/volume; here each shard
    contributes local sums and ``psum`` over ``(data, spatial)`` completes
    them, so the traced loss value — and therefore the per-device partial
    gradients — correspond to the unsharded objective exactly.
    """
    conditional = config.model.conditional
    interpolant = LinearInterpolant(one_sided=True)
    tc = config.training
    apply_raw = make_apply_fn(model, conditional)
    axes = ("data", "spatial")
    n_dev = mesh.shape["data"] * mesh.shape["spatial"]
    n_data_shards = mesh.shape["data"]

    def loss_fn(params, constants, labels, mask, key, di, si):
        table = constants["embedding"]
        model_constants = constants.get("model", {})
        x1_clean, x1, x0, t = spatial_draws(
            key, labels, table, tc.time_range, tc.x1_noise, di, si
        )
        xt, vt = interpolant.flow_objective(t, x0, x1)
        k_drop = jax.random.fold_in(
            jax.random.fold_in(jax.random.fold_in(key, 3), di), si
        )

        def apply_fn(p, *args):
            f = lambda p_, *a: apply_raw(
                p_, model_constants, *a,
                deterministic=False, rngs={"dropout": k_drop},
            )
            if tc.remat:
                f = jax.checkpoint(f, policy=remat_policy(tc, conditional))
            return f(p, *args)

        n_tot = labels.size * x1.shape[-1] * n_dev  # global element count

        if conditional:
            atb = x1_clean * mask[..., None]
            v_hat = apply_fn(params, xt, atb, t)
        else:
            v_hat = apply_fn(params, xt, t)

        sum_sq_diff = lax.psum(jnp.sum(jnp.square(v_hat - vt)), axes)
        sum_sq_vt = lax.psum(jnp.sum(jnp.square(vt)), axes)

        if not conditional:
            loss = sum_sq_diff / sum_sq_vt  # counts cancel in the ratio
            return loss, {"train_loss": loss}

        flow_loss = (sum_sq_diff / n_tot) / (sum_sq_vt / n_tot + 1e-6)

        t_b = t.reshape(-1, 1, 1, 1, 1)
        b_hat = xt + (1.0 - t_b) * v_hat
        mask_f = mask[..., None].astype(x1.dtype)
        n_masked = jnp.maximum(lax.psum(jnp.sum(mask_f), axes), 1.0) * x1.shape[-1]
        masked_mse = lax.psum(jnp.sum(jnp.square(b_hat - x1_clean) * mask_f), axes) / n_masked
        denom = lax.psum(jnp.sum(jnp.square(x1)), axes) / n_tot + 1e-6
        # t is replicated across spatial shards: reduce over data only
        t_mean = lax.psum(jnp.sum(t), "data") / (t.shape[0] * n_data_shards)
        reconstruct_loss = t_mean * masked_mse / denom

        loss = flow_loss + tc.lambda_reconstruct * reconstruct_loss
        return loss, {
            "train_loss": loss,
            "flow_loss": flow_loss,
            "reconstruct_loss": reconstruct_loss,
        }

    return loss_fn, conditional


def _spatial_in_specs(conditional: bool):
    batch_spec = P("data", "spatial")
    if conditional:
        return (P(), batch_spec, batch_spec, P())
    return (P(), batch_spec, P())


def _make_per_device_grads(model, config: ExperimentConfig, mesh: Mesh):
    """Shared per-device body: ``(state, labels, mask, key) -> (loss, metrics,
    grads)`` with grads already reduced — the single source of truth for the
    spatial gradient assembly (both the testable loss-and-grad entry and the
    production train step wrap it)."""
    loss_fn, conditional = _make_spatial_loss(model, config, mesh)

    def per_device_grads(state, labels, mask, key):
        key = jax.random.fold_in(key, state.step)
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index("spatial")
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, state.constants, labels, mask, key, di, si),
            has_aux=True,
        )(state.params)
        # pmean, not psum: every device seeds the SAME psum-assembled global
        # loss with cotangent 1, and the psum transpose is itself a psum, so
        # each per-device gradient already carries an n_devices factor (the 8
        # simultaneous reverse passes mix through the transposed collectives).
        # The mean over devices recovers the exact global gradient
        # (tests/test_shard_map.py pins this against the unsharded objective).
        grads = lax.pmean(grads, ("data", "spatial"))
        return loss, metrics, grads

    return per_device_grads, conditional


def make_spatial_loss_and_grad(model, config: ExperimentConfig, mesh: Mesh):
    """``f(state, labels[, mask], key) -> (loss, metrics, grads)`` under the
    spatial mesh — the testable core of :func:`make_spatial_train_step`."""
    per_device, conditional = _make_per_device_grads(model, config, mesh)

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    if conditional:
        return jax.jit(sharded)
    return jax.jit(lambda state, labels, key: sharded(state, labels, labels, key))


def make_spatial_train_step(model, tx, config: ExperimentConfig, mesh: Mesh):
    """Full training step with the voxel grid's X axis sharded over ``spatial``.

    ``model`` must be constructed with ``spatial_axis`` = the mesh's spatial
    axis name; ``labels`` (and ``mask`` for conditional — built globally by
    ``ops.masks.make_combined_mask`` before the step, since the jittered
    borehole grid needs global (x, y) coordinates) arrive sharded
    ``P("data", "spatial")`` on batch/X.  Params and optimiser state stay
    replicated; per-device gradients of the psum-assembled global loss are
    pmean'd over both axes (see the note in the per-device body), so every
    device applies the identical update.
    """
    per_device_grads, conditional = _make_per_device_grads(model, config, mesh)

    def per_device(state: TrainState, labels, mask, key):
        _, metrics, grads = per_device_grads(state, labels, mask, key)
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
        per_device, mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if conditional:
        return jax.jit(sharded, donate_argnums=(0,))
    return jax.jit(
        lambda state, labels, key: sharded(state, labels, labels, key),
        donate_argnums=(0,),
    )
