"""Flagship-config structural parity: parameter count vs the reference.

The reference unconditional model at its published config has 22,981,474
parameters (measured from the torch state dict on 2026-08-16, see
tools/measure_baseline.py).  ``jax.eval_shape`` counts ours without
materialising anything.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import (
    conditional_64,
    unconditional_64,
)
from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


REFERENCE_UNCOND_PARAMS = 22_981_474
# torch Unet3DCondV3 at dim=48, mults (1,2,2,3,4), 15ch, time_res 1024,
# attn 4x32 (measured from the reference model 2026-08-16)
REFERENCE_COND_PARAMS = 53_049_349


def _count_params(model, *args):
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *args))
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes["params"]))


def test_unconditional_flagship_param_count_matches_reference():
    config = unconditional_64()
    model = build_model(config)
    x = jnp.zeros((1, 64, 64, 64, 18), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    assert _count_params(model, x, t) == REFERENCE_UNCOND_PARAMS


def test_conditional_flagship_param_count_matches_reference():
    config = conditional_64()
    model = build_model(config)
    x = jnp.zeros((1, 64, 64, 64, 15), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    assert _count_params(model, x, x, t) == REFERENCE_COND_PARAMS
