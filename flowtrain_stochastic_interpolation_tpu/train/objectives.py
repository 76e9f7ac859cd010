"""Training objectives: unconditional + conditional stochastic interpolation.

Pure loss functions reproducing the reference Lightning ``training_step``s:

* unconditional (``model_train_inference.py:417-457``): embed + tiny noise,
  X0 ~ N(0,1), T ~ U(time_range), relative-MSE velocity matching
  ``mse(VT, V̂) / mse(VT, 0)``.
* conditional (``model_train_sh_inference_cond.py:401-467``): combined
  borehole/surface mask built **on device** (the reference loops in Python on
  the host, SURVEY.md §3.3), observations ``b = X1⊙mask``, conditioning
  ``ATb = X1 * mask``, straight-line reconstruction
  ``b̂ = XT + (1-T)·V̂`` on the mask, and the exact reference weighting
  ``mean(T) * mse_masked(b, b̂) / (mse(X1,0)+1e-6)`` — the reference's scalar
  ``F.mse_loss(b, b_hat)`` broadcast against ``T`` reduces to that product
  (SURVEY.md §2.3 note).

Masked MSE is computed as a weighted mean (sum over masked elements /
count), which is shape-static and jittable — the boolean-gather ``X1[mask]``
of the reference is shape-dynamic and would defeat XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from flowtrain_stochastic_interpolation_tpu.interpolants import Interpolant
from flowtrain_stochastic_interpolation_tpu.ops.embedding import embed
from flowtrain_stochastic_interpolation_tpu.ops.masks import make_combined_mask


def _rel_mse(target: Array, pred: Array, eps: float = 0.0) -> Array:
    # reduce in f32 regardless of storage dtype: a 2M-element mean of bf16
    # squares is not reliably f32-accumulated; the casts fuse into the
    # reduction (no materialised f32 copy of the volume)
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    num = jnp.mean(jnp.square(diff))
    den = jnp.mean(jnp.square(target.astype(jnp.float32))) + eps
    return num / den


def _draw_common(key, batch, table, time_range, x1_noise, dtype=None):
    """Draw (X1_clean, X1, X0, T).

    ``dtype``: storage dtype of the volume tensors (default: the embedding
    table's, i.e. f32).  ``bfloat16`` halves every [B,X,Y,Z,E] objective
    buffer — with the dtype-following interpolant coefficients this keeps
    the whole draw→interpolate→model pipeline in bf16 (the memory margin
    that fits 128³ b1 training on one chip).  T always stays f32: bf16
    cannot even represent 0.9995.
    """
    k_n, k_x0, k_t = jax.random.split(key, 3)
    x1_clean = embed(batch, table)  # [B, X, Y, Z, E]
    if dtype is not None:
        x1_clean = x1_clean.astype(dtype)
    x1 = x1_clean + jnp.asarray(x1_noise, x1_clean.dtype) * jax.random.normal(
        k_n, x1_clean.shape, x1_clean.dtype
    )
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    t = jax.random.uniform(
        k_t, (x1.shape[0],), jnp.float32,
        minval=time_range[0], maxval=time_range[1],
    )
    return x1_clean, x1, x0, t


def unconditional_loss(
    apply_fn: Callable,
    params: Any,
    constants: Any,
    batch: Array,
    key: Array,
    *,
    interpolant: Interpolant,
    time_range: Tuple[float, float],
    x1_noise: float = 1e-3,
    train: bool = True,
    objective_dtype=None,
) -> Tuple[Array, Dict[str, Array]]:
    """Relative-MSE flow objective (reference ``training_step`` :417-457).

    ``objective_dtype``: storage dtype of the drawn/interpolated volume
    tensors (``_draw_common``); the loss itself always reduces in f32.
    """
    k_data, k_drop = jax.random.split(key)
    table = constants["embedding"]
    _, x1, x0, t = _draw_common(
        k_data, batch, table, time_range, x1_noise, dtype=objective_dtype
    )

    xt, vt = interpolant.flow_objective(t, x0, x1)
    v_hat = apply_fn(
        params, xt, t, deterministic=not train,
        rngs={"dropout": k_drop} if train else None,
    )
    loss = _rel_mse(vt, v_hat)
    return loss, {"train_loss": loss}


def conditional_loss(
    apply_fn: Callable,
    params: Any,
    constants: Any,
    batch: Array,
    key: Array,
    *,
    interpolant: Interpolant,
    time_range: Tuple[float, float],
    x1_noise: float = 1e-4,
    lambda_reconstruct: float = 1.0,
    train: bool = True,
    objective_dtype=None,
) -> Tuple[Array, Dict[str, Array]]:
    """Flow + weighted straight-line reconstruction loss (ref :401-467)."""
    k_mask, k_data, k_drop = jax.random.split(key, 3)
    table = constants["embedding"]

    # observation operator: combined borehole+surface mask, built on device
    mask = make_combined_mask(k_mask, batch)  # [B, X, Y, Z] bool
    mask_e = mask[..., None]  # broadcast over embedding channels

    x1_clean, x1, x0, t = _draw_common(
        k_data, batch, table, time_range, x1_noise, dtype=objective_dtype
    )
    atb = x1_clean * mask_e  # reference: ATb = X1 * mask (before noise)

    xt, vt = interpolant.flow_objective(t, x0, x1)
    v_hat = apply_fn(
        params, xt, atb, t, deterministic=not train,
        rngs={"dropout": k_drop} if train else None,
    )

    flow_loss = _rel_mse(vt, v_hat, eps=1e-6)

    # straight-line reconstruction on observed voxels (ref :434-448)
    t_b = t.reshape(-1, 1, 1, 1, 1).astype(xt.dtype)
    b_hat = (xt + (1.0 - t_b) * v_hat).astype(jnp.float32)
    mask_f = mask_e.astype(jnp.float32)
    # mean over masked *elements*: mask counts voxels, error spans E channels
    n_masked = jnp.maximum(jnp.sum(mask_f), 1.0) * x1.shape[-1]
    masked_mse = (jnp.sum(jnp.square(b_hat - x1_clean.astype(jnp.float32)) * mask_f)
                  / n_masked)
    denom = jnp.mean(jnp.square(x1.astype(jnp.float32))) + 1e-6
    reconstruct_loss = jnp.mean(t) * masked_mse / denom

    loss = flow_loss + lambda_reconstruct * reconstruct_loss
    return loss, {
        "train_loss": loss,
        "flow_loss": flow_loss,
        "reconstruct_loss": reconstruct_loss,
    }
