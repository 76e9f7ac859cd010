"""Flash-attention kernel vs einsum reference (interpret mode on CPU).

On real TPU hardware the same kernel is exercised by
``tools/profile_breakdown.py`` and the benchmark; here the Pallas interpreter
validates numerics, padding (non-multiple key counts from the +4 memory KV),
and the custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flowtrain_stochastic_interpolation_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
)


def _run_interpret(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("n,m", [(256, 256), (256, 260), (300, 304)])
def test_flash_matches_reference(n, m):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, n, 2, 32))
    k = jax.random.normal(k2, (2, m, 2, 32))
    v = jax.random.normal(k3, (2, m, 2, 32))
    out = _run_interpret(
        functools.partial(flash_attention, block_q=128, block_k=128), q, k, v
    )
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, 128, 2, 16))
    k = jax.random.normal(k2, (1, 132, 2, 16))
    v = jax.random.normal(k3, (1, 132, 2, 16))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v)
        return jnp.sum(out * jnp.cos(out))

    g_flash = _run_interpret(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_flash_gradients_bf16_streams():
    """bf16 q/k/v through the custom VJP (the production train dtype).

    The backward's scan carry must stay f32 while streams are bf16 — a bf16
    zeros-init carry type-errored the first time the backward traced with
    bf16 inputs (r5 fa16 A/B, real TPU).  Gradients are compared to
    autodiff-of-reference at bf16-rounding tolerance."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (2, 256, 2, 32), jnp.bfloat16)
    k = jax.random.normal(k2, (2, 260, 2, 32), jnp.bfloat16)
    v = jax.random.normal(k3, (2, 260, 2, 32), jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128)
                       .astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v).astype(jnp.float32) ** 2)

    g_flash = _run_interpret(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        scale = np.abs(gr).max() + 1e-8
        assert np.abs(gf - gr).max() / scale < 5e-2, np.abs(gf - gr).max()
