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

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


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


@pytest.mark.parametrize("n,m", [(512, 512), (256, 384)])
def test_folded_matches_reference(n, m):
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_reference,
        linear_attention_folded,
    )

    heads, d = 4, 32
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(keys[0], (2, n, heads * d))
    k = jax.random.normal(keys[1], (2, m, heads * d))
    v = jax.random.normal(keys[2], (2, m, heads * d))
    mk = jax.random.normal(keys[3], (4, heads * d))
    mv = jax.random.normal(keys[4], (4, heads * d))
    out = _run_interpret(
        functools.partial(linear_attention_folded, heads=heads, block_n=128),
        q, k, v, mk, mv,
    )
    ref = _folded_reference(q, k, v, mk, mv, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-3)


def test_folded_reference_matches_headed_reference():
    """The folded-layout XLA reference (incl. mem-KV seeding) must equal the
    [B,N,h,d] composition used by the module's einsum path."""
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_reference,
    )

    heads, d = 4, 32
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    b, n = 2, 96
    q = jax.random.normal(keys[0], (b, n, heads, d))
    k = jax.random.normal(keys[1], (b, n, heads, d))
    v = jax.random.normal(keys[2], (b, n, heads, d))
    mk = jax.random.normal(keys[3], (heads, 4, d))  # [h, n_mem, d] param layout
    mv = jax.random.normal(keys[4], (heads, 4, d))

    # headed composition with concatenated mem tokens
    mk_b = jnp.broadcast_to(mk.transpose(1, 0, 2)[None], (b, 4, heads, d))
    mv_b = jnp.broadcast_to(mv.transpose(1, 0, 2)[None], (b, 4, heads, d))
    kk = jnp.concatenate([mk_b, k], axis=1)
    vv = jnp.concatenate([mv_b, v], axis=1)
    ref = linear_attention_reference(q, kk, vv)

    fold = lambda t: t.reshape(*t.shape[:-2], heads * d)
    out = _folded_reference(
        fold(q), fold(k), fold(v),
        fold(mk.transpose(1, 0, 2)), fold(mv.transpose(1, 0, 2)), heads,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(b, n, heads * d)),
        rtol=1e-5, atol=1e-6,
    )


def test_folded_gradients_match_reference():
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_reference,
        linear_attention_folded,
    )

    heads, d = 4, 32
    keys = jax.random.split(jax.random.PRNGKey(5), 5)
    q = jax.random.normal(keys[0], (1, 128, heads * d))
    k = jax.random.normal(keys[1], (1, 128, heads * d))
    v = jax.random.normal(keys[2], (1, 128, heads * d))
    mk = jax.random.normal(keys[3], (4, heads * d))
    mv = jax.random.normal(keys[4], (4, heads * d))

    def loss_fused(*a):
        return jnp.sum(jnp.tanh(linear_attention_folded(*a, heads=heads, block_n=128)))

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_folded_reference(*a, heads)))

    g_f = _run_interpret(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)), q, k, v, mk, mv)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, mk, mv)
    for gf, gr in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4)


def test_folded_survives_cross_head_logit_spread():
    """One head's q logits 200 below another head's: a *global* row-max shift
    underflows the low head's exp() to 0 (denominator 0 ⇒ NaN).  The kernel
    and the closed-form VJP must use per-head-group shifts (ADVICE r2)."""
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_reference,
        linear_attention_folded,
    )

    heads, d = 4, 32
    keys = jax.random.split(jax.random.PRNGKey(6), 5)
    q = jax.random.normal(keys[0], (1, 128, heads * d))
    # head 0's logits sit far below head 3's
    q = q.at[..., :d].add(-200.0).at[..., 3 * d:].add(50.0)
    k = jax.random.normal(keys[1], (1, 128, heads * d))
    v = jax.random.normal(keys[2], (1, 128, heads * d))
    mk = jax.random.normal(keys[3], (4, heads * d))
    mv = jax.random.normal(keys[4], (4, heads * d))

    out = _run_interpret(
        functools.partial(linear_attention_folded, heads=heads, block_n=128),
        q, k, v, mk, mv,
    )
    ref = _folded_reference(q, k, v, mk, mv, heads)  # per-head jax.nn.softmax
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-3)

    def loss(*a):
        return jnp.sum(jnp.tanh(linear_attention_folded(*a, heads=heads, block_n=128)))

    g = _run_interpret(jax.grad(loss, argnums=(0, 1, 2)), q, k, v, mk, mv)
    g_ref = jax.grad(lambda *a: jnp.sum(jnp.tanh(_folded_reference(*a, heads))),
                     argnums=(0, 1, 2))(q, k, v, mk, mv)
    for gf, gr in zip(g, g_ref):
        assert np.isfinite(np.asarray(gf)).all()
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4)


def test_folded_gating_requirements():
    """The folded kernel must only engage when h·d is a lane multiple and the
    token count is large; off-TPU (this test) the module must take the einsum
    path and still produce correct shapes with the same param tree."""
    from flowtrain_stochastic_interpolation_tpu.models.attention import (
        LinearAttention,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 16))
    for folded in (True, False):
        la = LinearAttention(dim=16, heads=4, dim_head=32, fused_folded=folded)
        v = la.init(jax.random.PRNGKey(1), x)
        out = la.apply(v, x)
        assert out.shape == x.shape
        assert "mem_kv" in v["params"]
        assert v["params"]["mem_kv"].shape == (2, 4, 4, 32)
    # hd not a lane multiple -> ValueError from the kernel entry if forced
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        linear_attention_folded,
    )

    q = jnp.zeros((1, 128, 96))
    with pytest.raises(ValueError, match="multiple of 128"):
        linear_attention_folded(q, q, q, jnp.zeros((4, 96)), jnp.zeros((4, 96)),
                                heads=3)


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


def test_chunked_closed_form_vjp_matches_oneshot():
    """Row-chunked closed-form backward == one-shot closed form == autodiff.

    The chunked form (4 lax.scan passes, chunk-bounded f32 memory) is what
    makes the 128³ b1 train step fit on one chip; rows couple only through
    the softmax normalisers / context reductions, so the math is identical
    up to f32 reassociation."""
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_reference,
        _folded_vjp_bwd_closed_form,
        _folded_vjp_bwd_closed_form_chunked,
    )

    heads, d = 4, 32
    n = 96 * 3  # deliberately not a power of two: chunk divisor search
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    q = jax.random.normal(keys[0], (2, n, heads * d))
    k = jax.random.normal(keys[1], (2, n, heads * d))
    v = jax.random.normal(keys[2], (2, n, heads * d))
    mk = jax.random.normal(keys[3], (4, heads * d))
    mv = jax.random.normal(keys[4], (4, heads * d))
    dout = jax.random.normal(keys[5], (2, n, heads * d))

    res = (q, k, v, mk, mv)
    g_one = _folded_vjp_bwd_closed_form(heads, 128, res, dout)
    g_chk = _folded_vjp_bwd_closed_form_chunked(heads, 128, res, dout,
                                                target_rows=96)
    for a, b_ in zip(g_one, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)

    # and both match autodiff of the reference composition
    _, vjp = jax.vjp(
        lambda qq, kk, vv, mkk, mvv: _folded_reference(qq, kk, vv, mkk, mvv, heads),
        q, k, v, mk, mv,
    )
    g_ad = vjp(dout)
    for a, b_ in zip(g_ad, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_closed_form_vjp_matches():
    """Stream-dtype (bf16) closed-form backward == the f32 closed form.

    VERDICT r3 #3(a): the bf16 mode keeps the [N, h·d] streams in the input
    dtype (f32 stabilizers only), so with f32 inputs it must agree to
    reassociation tolerance, and with bf16 inputs to bf16 rounding (~0.5%
    relative — the same rounding the bf16 forward already accepts)."""
    from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
        _folded_vjp_bwd_closed_form,
        _folded_vjp_bwd_closed_form_bf16,
    )

    heads, d = 4, 32
    keys = jax.random.split(jax.random.PRNGKey(11), 6)
    n = 256
    q, k, v = (jax.random.normal(keys[i], (2, n, heads * d)) for i in range(3))
    mk, mv = (jax.random.normal(keys[3 + i], (4, heads * d)) for i in range(2))
    dout = jax.random.normal(keys[5], (2, n, heads * d))

    # f32 inputs: identical math, reassociation-level agreement
    g_ref = _folded_vjp_bwd_closed_form(heads, 128, (q, k, v, mk, mv), dout)
    g_b16 = _folded_vjp_bwd_closed_form_bf16(heads, 128, (q, k, v, mk, mv), dout)
    for a, b_ in zip(g_b16, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)

    # bf16 inputs: bf16-rounding-level agreement against the f32 form
    cast = lambda t: t.astype(jnp.bfloat16)
    res16 = tuple(cast(t) for t in (q, k, v, mk, mv))
    g_ref16 = _folded_vjp_bwd_closed_form(heads, 128, res16, cast(dout))
    g_b16b = _folded_vjp_bwd_closed_form_bf16(heads, 128, res16, cast(dout))
    for a, b_ in zip(g_b16b, g_ref16):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale_ = np.abs(b_).max() + 1e-8
        assert np.abs(a - b_).max() / scale_ < 2e-2
        # elementwise relative error on non-tiny entries (ADVICE r4: global-max
        # normalisation can hide cancellation in dk = ekb*(d_pk - inner/Z);
        # that subtraction is computed in f32 inside the fusion, so non-tiny
        # entries must agree to bf16-rounding level elementwise too)
        mask = np.abs(b_) > 0.1 * scale_
        rel = np.abs(a[mask] - b_[mask]) / np.abs(b_[mask])
        assert rel.max() < 8e-2, rel.max()
