"""Explicit spatial-parallel primitives: sharded == unsharded, exactly.

Validates the context-parallel analogue for volumetric data (SURVEY.md §5
"long-context"; §2.6 SP/CP row): halo-exchange convs, sharded align-corners
resize, ring attention, and collective linear attention under ``shard_map``
on the 8-device CPU mesh must reproduce the single-device ops, and the whole
UNet forward with ``spatial_axis`` set must match the unsharded forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 8-device mesh fwd+bwd equivalence sweeps (~5 min); fast tier = -m "not slow"
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from flowtrain_stochastic_interpolation_tpu.models import UNet3D
from flowtrain_stochastic_interpolation_tpu.models.resize import resize3d
from flowtrain_stochastic_interpolation_tpu.parallel import create_mesh
from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
    halo_conv3d,
    ring_attention,
    sharded_linear_attention,
    sharded_resize3d,
)

SPATIAL = 4  # shards on the spatial axis


def _mesh():
    return create_mesh(n_data=1, n_spatial=SPATIAL)


def _shard_spatial(mesh, f, n_in, n_out, *args):
    """Run f inside shard_map with arg axes sharded per n_in specs."""
    return jax.shard_map(
        f, mesh=mesh,
        in_specs=tuple(P(*s) if s else P() for s in n_in),
        out_specs=P(*n_out),
    )(*args)


def test_halo_conv3d_matches_dense_conv():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 8, 8, 5))
    for k in (3, 7):
        w = jax.random.normal(jax.random.fold_in(key, k), (k, k, k, 5, 6)) * 0.1
        b = jax.random.normal(jax.random.fold_in(key, k + 1), (6,))
        ref = lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        ) + b

        mesh = _mesh()
        out = _shard_spatial(
            mesh,
            lambda xs, ws, bs: halo_conv3d(xs, ws, bs, "spatial"),
            [(None, "spatial"), None, None], (None, "spatial"),
            x, w, b,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [2.0, 0.5])
def test_sharded_resize3d_matches_dense(scale):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 8, 8, 3))
    ref = resize3d(x, scale)

    mesh = _mesh()
    out = _shard_spatial(
        mesh,
        lambda xs: sharded_resize3d(xs, scale, "spatial"),
        [(None, "spatial")], (None, "spatial"),
        x,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def _sdpa_reference(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", probs, v)


def test_ring_attention_matches_softmax_attention():
    key = jax.random.PRNGKey(2)
    b, n, h, d, m = 2, 32, 2, 8, 4
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, n, h, d))
               for i in range(3))
    mk, mv = (jax.random.normal(jax.random.fold_in(key, 10 + i), (b, m, h, d))
              for i in range(2))
    ref = _sdpa_reference(q, jnp.concatenate([mk, k], 1), jnp.concatenate([mv, v], 1))

    mesh = _mesh()
    out = _shard_spatial(
        mesh,
        lambda qs, ks, vs, mks, mvs: ring_attention(
            qs, ks, vs, "spatial", mem_k=mks, mem_v=mvs
        ),
        [(None, "spatial")] * 3 + [None, None], (None, "spatial"),
        q, k, v, mk, mv,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_linear_attention_matches_reference():
    key = jax.random.PRNGKey(3)
    b, n, h, d, m = 2, 32, 2, 8, 4
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, n, h, d))
               for i in range(3))
    mk, mv = (jax.random.normal(jax.random.fold_in(key, 10 + i), (b, m, h, d))
              for i in range(2))

    # reference composition (unet_attn_3d.py:308-341 semantics)
    kk = jnp.concatenate([mk, k], axis=1)
    vv = jnp.concatenate([mv, v], axis=1)
    qs = jax.nn.softmax(q, axis=-1) * d ** -0.5
    ks = jax.nn.softmax(kk, axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", ks, vv)
    ref = jnp.einsum("bhde,bnhd->bnhe", ctx, qs)

    mesh = _mesh()
    out = _shard_spatial(
        mesh,
        lambda q_, k_, v_, mk_, mv_: sharded_linear_attention(
            q_, k_, v_, "spatial", mem_k=mk_, mem_v=mv_
        ),
        [(None, "spatial")] * 3 + [None, None], (None, "spatial"),
        q, k, v, mk, mv,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_halo_conv3d_grads_match_dense_conv():
    """d/dx and d/dw through the ppermute halo exchange == dense conv grads
    (the halo transpose — reversed ppermute + edge-zeroing — is exactly where
    wrong-gradient bugs live; VERDICT r2 weak #2)."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 16, 8, 8, 5))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 5, 6)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (6,))

    def ref(x_, w_, b_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        ) + b_

    sharded = jax.shard_map(
        lambda xs, ws, bs: halo_conv3d(xs, ws, bs, "spatial"),
        mesh=_mesh(),
        in_specs=(P(None, "spatial"), P(), P()),
        out_specs=P(None, "spatial"),
    )
    loss = lambda f: lambda x_, w_, b_: jnp.sum(f(x_, w_, b_) ** 2)
    for argnum in (0, 1, 2):
        gs = jax.grad(loss(sharded), argnums=argnum)(x, w, b)
        gr = jax.grad(loss(ref), argnums=argnum)(x, w, b)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [2.0, 0.5])
def test_sharded_resize3d_grads_match_dense(scale):
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 8, 8, 3))
    sharded = jax.shard_map(
        lambda xs: sharded_resize3d(xs, scale, "spatial"),
        mesh=_mesh(), in_specs=(P(None, "spatial"),), out_specs=P(None, "spatial"),
    )
    gs = jax.grad(lambda x_: jnp.sum(sharded(x_) ** 2))(x)
    gr = jax.grad(lambda x_: jnp.sum(resize3d(x_, scale) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr), rtol=1e-5, atol=1e-6)


def _attn_grad_case(sharded_fn, ref_fn):
    key = jax.random.PRNGKey(6)
    b, n, h, d, m = 2, 32, 2, 8, 4
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, n, h, d))
               for i in range(3))
    mk, mv = (jax.random.normal(jax.random.fold_in(key, 10 + i), (b, m, h, d))
              for i in range(2))
    args = (q, k, v, mk, mv)
    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    for argnum in range(5):
        gs = jax.grad(loss(sharded_fn), argnums=argnum)(*args)
        gr = jax.grad(loss(ref_fn), argnums=argnum)(*args)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=f"grad argnum={argnum}",
        )


def test_ring_attention_grads_match_softmax_attention():
    """Grads through the K/V ring (ppermute transposes + online-max scan
    unrolled by autodiff) == dense softmax-attention grads, all 5 args."""
    sharded = jax.shard_map(
        lambda q, k, v, mk, mv: ring_attention(q, k, v, "spatial", mem_k=mk, mem_v=mv),
        mesh=_mesh(),
        in_specs=(P(None, "spatial"),) * 3 + (P(), P()),
        out_specs=P(None, "spatial"),
    )

    def ref(q, k, v, mk, mv):
        return _sdpa_reference(q, jnp.concatenate([mk, k], 1), jnp.concatenate([mv, v], 1))

    _attn_grad_case(sharded, ref)


def test_sharded_linear_attention_grads_match_reference():
    """Grads through pmax/psum collective softmax == unsharded composition.
    (pmax has no differentiation rule; the stability shift is stop_gradient'd
    exactly as in jax.nn.softmax — this test pins that down.)"""
    sharded = jax.shard_map(
        lambda q, k, v, mk, mv: sharded_linear_attention(
            q, k, v, "spatial", mem_k=mk, mem_v=mv
        ),
        mesh=_mesh(),
        in_specs=(P(None, "spatial"),) * 3 + (P(), P()),
        out_specs=P(None, "spatial"),
    )

    def ref(q, k, v, mk, mv):
        d = q.shape[-1]
        kk = jnp.concatenate([mk, k], axis=1)
        vv = jnp.concatenate([mv, v], axis=1)
        qs = jax.nn.softmax(q, axis=-1) * d ** -0.5
        ks = jax.nn.softmax(kk, axis=1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", ks, vv)
        return jnp.einsum("bhde,bnhd->bnhe", ctx, qs)

    _attn_grad_case(sharded, ref)


def test_unet_spatial_axis_matches_unsharded():
    """Whole UNet forward inside shard_map with X sharded: the explicit
    halo/ring/collective path must reproduce the plain forward."""
    cfg = dict(
        dim=8, dim_mults=(1, 2), data_channels=6, dropout=0.0,
        time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
        attn_dim_head=4, attn_heads=2, flash_attn=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 8, 6))
    t = jnp.asarray([0.3, 0.7])

    plain = UNet3D(**cfg)
    variables = plain.init(jax.random.PRNGKey(1), x, t)
    ref = plain.apply(variables, x, t)

    sharded_model = UNet3D(**cfg, spatial_axis="spatial")
    mesh = _mesh()

    out = jax.jit(
        jax.shard_map(
            lambda v, xs, ts: sharded_model.apply(v, xs, ts),
            mesh=mesh,
            in_specs=(P(), P(None, "spatial"), P()),
            out_specs=P(None, "spatial"),
        )
    )(variables, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_unet_spatial_axis_grads_match_unsharded():
    """Full-UNet parameter gradients through the explicit spatial-parallel
    path (halo convs, sharded resize, ring + collective linear attention)
    == plain-UNet gradients.  This is the backward half of the spatial
    train-step story (VERDICT r2 missing #1)."""
    cfg = dict(
        dim=8, dim_mults=(1, 2), data_channels=6, dropout=0.0,
        time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
        attn_dim_head=4, attn_heads=2, flash_attn=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 8, 8, 6))
    t = jnp.asarray([0.3, 0.7])

    plain = UNet3D(**cfg)
    variables = plain.init(jax.random.PRNGKey(8), x, t)
    target = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def ref_loss(v, x_):
        return jnp.mean((plain.apply(v, x_, t) - target) ** 2)

    sharded_model = UNet3D(**cfg, spatial_axis="spatial")
    apply_sh = jax.shard_map(
        lambda v, xs, ts: sharded_model.apply(v, xs, ts),
        mesh=_mesh(),
        in_specs=(P(), P(None, "spatial"), P()),
        out_specs=P(None, "spatial"),
    )

    def sh_loss(v, x_):
        return jnp.mean((apply_sh(v, x_, t) - target) ** 2)

    gr_v, gr_x = jax.grad(ref_loss, argnums=(0, 1))(variables, x)
    gs_v, gs_x = jax.jit(jax.grad(sh_loss, argnums=(0, 1)))(variables, x)

    np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gr_x), rtol=5e-4, atol=5e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(gr_v)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs_v))
    for path, leaf_r in flat_r:
        leaf_s = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_r), rtol=5e-4, atol=5e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_make_spatial_sampler_matches_unsharded():
    """Full sampling pipeline (ODE integration + decode) under the spatial
    mesh == the single-device ``make_sampler`` pipeline."""
    from flowtrain_stochastic_interpolation_tpu.inference import (
        make_sampler,
        make_spatial_sampler,
    )
    from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding

    cfg = dict(
        dim=8, dim_mults=(1, 2), data_channels=6, dropout=0.0,
        time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
        attn_dim_head=4, attn_heads=2, flash_attn=False,
    )
    table = jnp.asarray(simplex_embedding(5, 6))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8, 8, 6))

    plain = UNet3D(**cfg)
    t_init = jnp.asarray([0.3, 0.7])
    variables = plain.init(jax.random.PRNGKey(4), x0, t_init)

    ref = make_sampler(
        plain, variables, table, n_frames=3, substeps=1, method="rk4",
        with_prominence=True,
    )(x0)

    mesh = _mesh()
    sharded_model = UNet3D(**cfg, spatial_axis="spatial")
    sampler = make_spatial_sampler(
        sharded_model, variables, table, mesh,
        n_frames=3, substeps=1, method="rk4", with_prominence=True,
    )
    x0_sh = jax.device_put(x0, NamedSharding(mesh, P("data", "spatial")))
    out = sampler(x0_sh)

    np.testing.assert_array_equal(np.asarray(out["decoded"]), np.asarray(ref["decoded"]))
    np.testing.assert_allclose(
        np.asarray(out["prominence"]), np.asarray(ref["prominence"]),
        rtol=2e-4, atol=2e-4,
    )


def test_make_spatial_sampler_conditional_matches_unsharded():
    """Conditional (ATb-driven) spatial sampling == single-device pipeline."""
    from flowtrain_stochastic_interpolation_tpu.inference import (
        make_sampler,
        make_spatial_sampler,
    )
    from flowtrain_stochastic_interpolation_tpu.models import UNet3DCond
    from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding

    cfg = dict(
        dim=8, dim_mults=(1, 2), data_channels=6, dropout=0.0,
        time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
        attn_dim_head=4, attn_heads=2, flash_attn=False,
    )
    table = jnp.asarray(simplex_embedding(5, 6))
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 8, 8, 6))
    atb = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 8, 8, 6)) * 0.3

    plain = UNet3DCond(**cfg)
    t_init = jnp.asarray([0.3, 0.7])
    variables = plain.init(jax.random.PRNGKey(4), x0, atb, t_init)

    ref = make_sampler(
        plain, variables, table, conditional=True,
        n_frames=3, substeps=1, method="rk4",
    )(x0, atb)

    mesh = _mesh()
    sharded_model = UNet3DCond(**cfg, spatial_axis="spatial")
    sampler = make_spatial_sampler(
        sharded_model, variables, table, mesh, conditional=True,
        n_frames=3, substeps=1, method="rk4",
    )
    sh = NamedSharding(mesh, P("data", "spatial"))
    out = sampler(jax.device_put(x0, sh), jax.device_put(atb, sh))
    np.testing.assert_array_equal(np.asarray(out["decoded"]), np.asarray(ref["decoded"]))
