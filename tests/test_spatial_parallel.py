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
