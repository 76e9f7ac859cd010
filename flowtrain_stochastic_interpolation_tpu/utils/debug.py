"""Numerical-safety helpers (SURVEY.md §5 "race detection / sanitizers").

The reference has no sanitizers (no native code); the JAX-native analogue is
NaN/Inf detection and determinism checks:

* :func:`enable_nan_checking` — global ``jax_debug_nans`` toggle;
* :func:`check_finite` — pytree finiteness assertion usable inside jitted
  code via ``jax.debug`` callbacks or outside on host values;
* :func:`grad_health` — per-step gradient statistics (norm, max, finite
  fraction) to log next to the reference's ``on_after_backward`` grad-norm
  prints (``model_train_sh_inference_cond.py:476-485``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def enable_nan_checking(enable: bool = True) -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises immediately."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree: Any, name: str = "tree") -> None:
    """Host-side assertion that every leaf is finite."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            key = "/".join(str(p) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{key}")


def grad_health(grads: Any) -> Dict[str, jax.Array]:
    """Jit-safe gradient statistics for metric logging."""
    leaves = jax.tree.leaves(grads)
    total = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    max_abs = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))
    finite = sum(jnp.sum(jnp.isfinite(g)) for g in leaves)
    count = sum(g.size for g in leaves)
    return {
        "grad_norm": jnp.sqrt(total),
        "grad_max_abs": max_abs,
        "grad_finite_frac": finite / count,
    }
