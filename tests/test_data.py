"""Data sources: device synthetic generator, native C++ generator, toy 2D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
    SyntheticGeoDataset,
    synthetic_geology,
    synthetic_geology_batch,
)
from flowtrain_stochastic_interpolation_tpu.data.toy import Gaussian2d, GaussianMixed


def test_synthetic_geology_category_convention():
    vol = synthetic_geology(jax.random.PRNGKey(0), (32, 32, 32), 15)
    v = np.asarray(vol)
    assert v.shape == (32, 32, 32)
    assert v.min() >= -1 and v.max() <= 13  # air=-1, 14 rock categories
    # air exists and sits at the top of the volume
    assert (v == -1).any()
    air_frac_top = (v[:, :, -4:] == -1).mean()
    air_frac_bottom = (v[:, :, :4] == -1).mean()
    assert air_frac_top > air_frac_bottom
    # strata: multiple rock categories present
    assert len(np.unique(v[v >= 0])) >= 3


def test_synthetic_batch_and_determinism():
    b1 = synthetic_geology_batch(jax.random.PRNGKey(1), 3, (16, 16, 16))
    b2 = synthetic_geology_batch(jax.random.PRNGKey(1), 3, (16, 16, 16))
    assert b1.shape == (3, 16, 16, 16)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert not np.array_equal(np.asarray(b1[0]), np.asarray(b1[1]))


def test_dataset_streaming_api():
    ds = SyntheticGeoDataset((16, 16, 16), dataset_size=8, seed=3)
    assert len(ds) == 8
    item = ds[0]
    assert item.shape == (16, 16, 16)
    batches = list(ds.batches(4, epoch=0))
    assert len(batches) == 2 and batches[0].shape == (4, 16, 16, 16)
    # distinct epochs give distinct data
    b_e1 = next(iter(ds.batches(4, epoch=1)))
    assert not np.array_equal(np.asarray(batches[0]), np.asarray(b_e1))


def test_native_generator_matches_conventions():
    native = pytest.importorskip(
        "flowtrain_stochastic_interpolation_tpu.data.native"
    )
    if not native.native_available():
        pytest.skip("no native toolchain")
    b = native.generate_batch(2, (32, 32, 32), seed=5)
    assert b.shape == (2, 32, 32, 32) and b.dtype == np.int32
    assert b.min() >= -1 and b.max() <= 13
    assert (b == -1).any()
    np.testing.assert_array_equal(b, native.generate_batch(2, (32, 32, 32), seed=5))
    ds = native.NativeGeoDataset((16, 16, 16), dataset_size=8, seed=1)
    batches = list(ds.batches(4))
    assert len(batches) == 2 and batches[0].shape == (4, 16, 16, 16)


def test_gaussian_toys():
    g = Gaussian2d(mean=(1.0, -1.0))
    s = g.sample(jax.random.PRNGKey(0), 4096)
    np.testing.assert_allclose(np.asarray(s.mean(0)), [1.0, -1.0], atol=0.1)
    cov_emp = np.cov(np.asarray(s).T)
    np.testing.assert_allclose(cov_emp, np.asarray(g.covariance), atol=0.15)

    m = GaussianMixed()
    sm = np.asarray(m.sample(jax.random.PRNGKey(1), 4096))
    # 60/40 mixture of means (-2,-2) and (2,2) -> overall mean = -0.4
    np.testing.assert_allclose(sm.mean(0), [-0.4, -0.4], atol=0.2)
