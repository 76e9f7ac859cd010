"""Tests for embedding, mask, and ensemble ops."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.ops.embedding import (
    decode,
    decode_logits,
    embed,
    prominence,
    simplex_embedding,
)
from flowtrain_stochastic_interpolation_tpu.ops.ensemble import (
    entropy,
    most_probable_model,
    vote_probabilities,
)
from flowtrain_stochastic_interpolation_tpu.ops.masks import (

    make_boreholes_mask,
    make_boreholes_reduced_mask,
    make_combined_mask,
    make_surface_mask,
)

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


# --------------------------- embedding ---------------------------
def test_simplex_embedding_properties():
    table = simplex_embedding(15, 18)
    assert table.shape == (15, 18)
    np.testing.assert_allclose(np.linalg.norm(table, axis=1), 1.0, rtol=1e-6)
    # rows sum to zero in the simplex subspace (centred at origin)
    np.testing.assert_allclose(table.sum(axis=0), 0.0, atol=1e-5)
    # pairwise cosine similarity is the constant simplex value -1/(n-1)
    gram = table @ table.T
    off = gram[~np.eye(15, dtype=bool)]
    np.testing.assert_allclose(off, -1.0 / 14.0, atol=1e-5)


def test_embed_decode_roundtrip():
    table = jnp.asarray(simplex_embedding(15, 18))
    cats = jax.random.randint(jax.random.PRNGKey(0), (2, 8, 8, 8), -1, 14)
    x = embed(cats, table)
    assert x.shape == (2, 8, 8, 8, 18)
    # decode returns 0-based rows; subtract offset to recover categories
    rec = decode(x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape), table) - 1
    assert (rec == cats).mean() > 0.999


def test_embed_accepts_trailing_channel():
    table = jnp.asarray(simplex_embedding(15, 18))
    cats = jnp.zeros((2, 4, 4, 4, 1), dtype=jnp.int32)
    assert embed(cats, table).shape == (2, 4, 4, 4, 18)


def test_prominence_range():
    table = jnp.asarray(simplex_embedding(15, 18))
    x = embed(jnp.zeros((1, 4, 4, 4), jnp.int32), table)
    logits = decode_logits(x, table)
    p = prominence(logits)
    assert p.shape == (1, 4, 4, 4)
    assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0


# --------------------------- masks ---------------------------
def test_boreholes_mask_columns():
    key = jax.random.PRNGKey(0)
    mask = make_boreholes_mask(key, (3, 64, 64, 64))
    m = np.asarray(mask)
    assert m.shape == (3, 64, 64, 64)
    # columns are full depth: per-(x,y) either all True or all False
    col_any = m.any(axis=-1)
    col_all = m.all(axis=-1)
    np.testing.assert_array_equal(col_any, col_all)
    # n_bores within [8, 32) per item (jitter can collide: <= 31 columns)
    counts = col_any.reshape(3, -1).sum(axis=1)
    assert (counts >= 4).all() and (counts <= 31).all()
    # different items get different layouts
    assert not np.array_equal(col_any[0], col_any[1])


def test_surface_mask_semantics():
    batch = jnp.zeros((1, 4, 4, 8), jnp.int32)
    # air column above z>=5 at (0,0)
    batch = batch.at[0, 0, 0, 5:].set(-1)
    m = np.asarray(make_surface_mask(batch))
    assert m[0, :, :, 7].all()  # top slice always observed
    assert m[0, 0, 0, 5] and m[0, 0, 0, 4]  # air + one below
    assert not m[0, 1, 1, 3]  # interior unobserved


def test_combined_mask_is_union():
    key = jax.random.PRNGKey(1)
    batch = jnp.zeros((2, 16, 16, 16), jnp.int32).at[:, :, :, 12:].set(-1)
    cm = make_combined_mask(key, batch)
    sm = make_surface_mask(batch)
    bm = make_boreholes_mask(key, batch.shape)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(sm | bm))


def test_reduced_boreholes_limited_depth():
    key = jax.random.PRNGKey(2)
    batch = jnp.zeros((1, 32, 32, 32), jnp.int32).at[:, :, :, 24:].set(-1)
    m = np.asarray(make_boreholes_reduced_mask(key, batch, depth=16))
    # below z = 24-16 = 8 nothing is observed
    assert not m[0, :, :, :8].any()
    # air region is observed
    assert m[0, :, :, 24:].all()


def test_masks_are_jittable():
    f = jax.jit(lambda k, b: make_combined_mask(k, b))
    out = f(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 16), jnp.int32))
    assert out.dtype == jnp.bool_


# --------------------------- ensemble ---------------------------
def test_vote_probabilities_and_entropy():
    # 4 ensemble members, all agreeing on category 3 except one voxel
    sols = jnp.full((4, 2, 2, 2), 3, jnp.int32)
    sols = sols.at[0, 0, 0, 0].set(-1)
    probs = vote_probabilities(sols, n_cats=15)
    assert probs.shape == (2, 2, 2, 15)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(probs[0, 0, 0, 4], 0.75)
    np.testing.assert_allclose(probs[0, 0, 0, 0], 0.25)
    ent = entropy(probs)
    assert float(ent[1, 1, 1]) == 0.0
    assert float(ent[0, 0, 0]) > 0.0
    mp = most_probable_model(probs)
    assert int(mp[0, 0, 0]) == 3 and int(mp[1, 1, 1]) == 3
