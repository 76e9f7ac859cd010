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
    num = jnp.mean(jnp.square(pred - target))
    den = jnp.mean(jnp.square(target)) + eps
    return num / den


def _draw_common(key, batch, table, time_range, x1_noise):
    k_n, k_x0, k_t = jax.random.split(key, 3)
    x1_clean = embed(batch, table)  # [B, X, Y, Z, E]
    x1 = x1_clean + x1_noise * jax.random.normal(k_n, x1_clean.shape, x1_clean.dtype)
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    t = jax.random.uniform(
        k_t, (x1.shape[0],), x1.dtype, minval=time_range[0], maxval=time_range[1]
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
) -> Tuple[Array, Dict[str, Array]]:
    """Relative-MSE flow objective (reference ``training_step`` :417-457)."""
    k_data, k_drop = jax.random.split(key)
    table = constants["embedding"]
    _, x1, x0, t = _draw_common(k_data, batch, table, time_range, x1_noise)

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
) -> Tuple[Array, Dict[str, Array]]:
    """Flow + weighted straight-line reconstruction loss (ref :401-467)."""
    k_mask, k_data, k_drop = jax.random.split(key, 3)
    table = constants["embedding"]

    # observation operator: combined borehole+surface mask, built on device
    mask = make_combined_mask(k_mask, batch)  # [B, X, Y, Z] bool
    mask_e = mask[..., None]  # broadcast over embedding channels

    x1_clean, x1, x0, t = _draw_common(k_data, batch, table, time_range, x1_noise)
    atb = x1_clean * mask_e  # reference: ATb = X1 * mask (before noise)

    xt, vt = interpolant.flow_objective(t, x0, x1)
    v_hat = apply_fn(
        params, xt, atb, t, deterministic=not train,
        rngs={"dropout": k_drop} if train else None,
    )

    flow_loss = _rel_mse(vt, v_hat, eps=1e-6)

    # straight-line reconstruction on observed voxels (ref :434-448)
    t_b = t.reshape(-1, 1, 1, 1, 1)
    b_hat = xt + (1.0 - t_b) * v_hat
    mask_f = mask_e.astype(x1.dtype)
    # mean over masked *elements*: mask counts voxels, error spans E channels
    n_masked = jnp.maximum(jnp.sum(mask_f), 1.0) * x1.shape[-1]
    masked_mse = jnp.sum(jnp.square(b_hat - x1_clean) * mask_f) / n_masked
    denom = jnp.mean(jnp.square(x1)) + 1e-6
    reconstruct_loss = jnp.mean(t) * masked_mse / denom

    loss = flow_loss + lambda_reconstruct * reconstruct_loss
    return loss, {
        "train_loss": loss,
        "flow_loss": flow_loss,
        "reconstruct_loss": reconstruct_loss,
    }
