"""Device-free jaxpr FLOP counter (utils/flops.py) — bench.py's MFU source."""

import jax
import jax.numpy as jnp
import pytest
from jax import lax

from flowtrain_stochastic_interpolation_tpu.utils.flops import count_conv_dot_flops

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


def test_dot_exact():
    a = jax.ShapeDtypeStruct((128, 64), jnp.float32)
    b = jax.ShapeDtypeStruct((64, 256), jnp.float32)
    assert count_conv_dot_flops(lambda a, b: a @ b, a, b) == 2 * 128 * 256 * 64


def test_batched_dot_general():
    a = jax.ShapeDtypeStruct((4, 32, 16), jnp.bfloat16)
    b = jax.ShapeDtypeStruct((4, 16, 8), jnp.bfloat16)
    got = count_conv_dot_flops(lambda a, b: jnp.einsum("bij,bjk->bik", a, b), a, b)
    assert got == 2 * 4 * 32 * 8 * 16


def test_conv3d_exact():
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    x = jax.ShapeDtypeStruct((2, 8, 8, 8, 4), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 3, 4, 16), jnp.float32)
    assert count_conv_dot_flops(conv, x, w) == 2 * 2 * 512 * 16 * 4 * 27


def test_strided_conv_uses_output_spatial():
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x = jax.ShapeDtypeStruct((1, 16, 16, 4), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 4, 8), jnp.float32)
    # out spatial 8x8, not 16x16
    assert count_conv_dot_flops(conv, x, w) == 2 * 1 * 64 * 8 * 4 * 9


def test_scan_multiplies_by_length():
    b = jax.ShapeDtypeStruct((64, 64), jnp.float32)

    def g(a, b):
        def body(c, _):
            return jnp.tanh(c @ b), None

        out, _ = lax.scan(body, a, None, length=5)
        return out.sum()

    a = jax.ShapeDtypeStruct((64, 64), jnp.float32)
    assert count_conv_dot_flops(g, a, b) == 5 * 2 * 64**3


def test_grad_counts_transpose_matmuls():
    b = jax.ShapeDtypeStruct((64, 64), jnp.float32)
    a = jax.ShapeDtypeStruct((64, 64), jnp.float32)

    def g(a, b):
        def body(c, _):
            return jnp.tanh(c @ b), None

        out, _ = lax.scan(body, a, None, length=5)
        return out.sum()

    # grad wrt a: fwd 5 matmuls + bwd 5 cotangent matmuls
    got = count_conv_dot_flops(jax.grad(g), a, b)
    assert got == 10 * 2 * 64**3


def test_jit_and_cond_recursion():
    a = jax.ShapeDtypeStruct((32, 32), jnp.float32)

    @jax.jit
    def f(a):
        return lax.cond(
            a.sum() > 0,
            lambda x: x @ x,          # 2*32^3
            lambda x: (x @ x) @ x,    # 2*2*32^3 — cond charges the max branch
            a,
        )

    assert count_conv_dot_flops(f, a) == 2 * 2 * 32**3


def test_flagship_model_traceable_without_device():
    """The counter traces the real (small) UNet without touching a device."""
    from flowtrain_stochastic_interpolation_tpu.config import tiny_test
    from flowtrain_stochastic_interpolation_tpu.train.loop import (
        build_model,
        init_model_variables,
    )

    cfg = tiny_test()
    model = build_model(cfg)
    variables = init_model_variables(cfg)
    x = jax.ShapeDtypeStruct((2, 8, 8, 8, 15), jnp.float32)
    t = jax.ShapeDtypeStruct((2,), jnp.float32)
    flops = count_conv_dot_flops(lambda x, t: model.apply(variables, x, t), x, t)
    assert flops > 1e6  # convs dominate; exact value asserted by bench usage
