"""Fused linear-attention kernel vs the reference einsum composition."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
    linear_attention,
    linear_attention_reference,
)


def _run_interpret(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("n,m", [(256, 260), (512, 512), (300, 304)])
def test_fused_matches_reference(n, m):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, n, 2, 32))
    k = jax.random.normal(k2, (2, m, 2, 32))
    v = jax.random.normal(k3, (2, m, 2, 32))
    out = _run_interpret(
        functools.partial(linear_attention, block_n=128), q, k, v
    )
    ref = linear_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_fused_gradients_match_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, 128, 2, 16))
    k = jax.random.normal(k2, (1, 132, 2, 16))
    v = jax.random.normal(k3, (1, 132, 2, 16))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.tanh(linear_attention(q, k, v, block_n=128)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(linear_attention_reference(q, k, v)))

    g_f = _run_interpret(jax.grad(loss_fused, argnums=(0, 1, 2)), q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4)


def test_module_semantics_match_torch_reference_composition():
    """The einsum path inside LinearAttention equals the standalone reference
    composition (same softmax axes/scale as unet_attn_3d.py:308-341)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (2, 64, 4, 32))
    k = jax.random.normal(k2, (2, 68, 4, 32))
    v = jax.random.normal(k3, (2, 68, 4, 32))
    scale = 32**-0.5
    qs = jax.nn.softmax(q, axis=-1) * scale
    ks = jax.nn.softmax(k, axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", ks, v)
    out_einsum = jnp.einsum("bhde,bnhd->bnhe", ctx, qs)
    ref = linear_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_einsum), np.asarray(ref), rtol=1e-5, atol=1e-6)
