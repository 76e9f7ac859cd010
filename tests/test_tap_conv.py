"""Tap-folded Pallas conv (ops/tap_conv.py): numerics + custom VJP vs XLA.

Runs the kernel in Pallas TPU interpret mode so the block/grid semantics
(Element specs, revisited dw output block, scratch patch buffer) are
exercised on CPU exactly as they execute on the TPU grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flowtrain_stochastic_interpolation_tpu.ops.tap_conv import (
    tap_conv3d,
    use_tap_conv,
)


def _direct(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return (y.astype(jnp.float32) + b).astype(x.dtype)


def _run_interpret(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("shape,cin,cout", [
    ((8, 8, 8), 5, 7),      # minimum tile, odd channels
    ((16, 8, 16), 3, 4),    # multi-tile x, bz=16 z-chunk path
])
def test_tap_conv_matches_direct(shape, cin, cout):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (2, *shape, cin), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, cin, cout), jnp.float32)
    b = jax.random.normal(kb, (cout,), jnp.float32)
    y_ref = _direct(x, w, b)
    y_tap = _run_interpret(tap_conv3d, x, w, b)
    np.testing.assert_allclose(np.asarray(y_tap), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_tap_conv_custom_vjp_matches_direct():
    """dx, dw, db through the hand-written VJP equal autodiff of the XLA conv."""
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (1, 8, 8, 8, 3), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, 3, 5), jnp.float32)
    b = jax.random.normal(kb, (5,), jnp.float32)

    def loss(conv, x, w, b):
        y = conv(x, w, b)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)) * y.astype(jnp.float32))

    gd = jax.grad(lambda x, w, b: loss(_direct, x, w, b), argnums=(0, 1, 2))(x, w, b)
    gt = _run_interpret(
        jax.grad(lambda x, w, b: loss(tap_conv3d, x, w, b), argnums=(0, 1, 2)),
        x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gt, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=5e-3, atol=1e-3, err_msg=name)


def test_use_tap_conv_eligibility():
    assert use_tap_conv((64, 64, 64), 48, 48, 3)
    assert not use_tap_conv((64, 64, 64), 48, 48, 7)    # kernel
    assert not use_tap_conv((12, 64, 64), 48, 48, 3)    # x tile
    assert not use_tap_conv((64, 64, 60), 48, 48, 3)    # z multiple
    assert not use_tap_conv((64, 64, 64), 48, 144, 3)   # lane width
