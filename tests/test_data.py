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

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)



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


def test_prefetch_order_and_exception():
    from flowtrain_stochastic_interpolation_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(10)), depth=2)) == list(range(10))

    def bad():
        yield 1
        raise ValueError("producer broke")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer broke"):
        list(it)


def test_geogen_adapter_with_recorded_fixture(monkeypatch):
    """Drives the real GeoGenDataset adapter (incl. threaded prefetch) against
    a fake ``geogen`` package backed by recorded samples — the CI-testable
    stand-in for the external StructuralGeo dependency (SURVEY.md §7)."""
    import os
    import sys
    import types

    import torch

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "geogen_recorded.npz")
    samples = np.load(fixture)["samples"]  # [8, 16, 16, 16] int32, air=-1

    class FakeStreaming:
        def __init__(self, model_resolution, model_bounds, dataset_size, device):
            assert tuple(model_resolution) == (16, 16, 16)
            self.n = dataset_size

        def __getitem__(self, idx):
            # reference yields [1, X, Y, Z] torch tensors (SURVEY.md LX row)
            return torch.from_numpy(samples[idx % len(samples)])[None]

    pkg = types.ModuleType("geogen")
    mod = types.ModuleType("geogen.dataset")
    mod.GeoData3DStreamingDataset = FakeStreaming
    pkg.dataset = mod
    monkeypatch.setitem(sys.modules, "geogen", pkg)
    monkeypatch.setitem(sys.modules, "geogen.dataset", mod)

    from flowtrain_stochastic_interpolation_tpu.data.geogen import (
        GeoGenDataset,
        geogen_available,
    )

    assert geogen_available()
    ds = GeoGenDataset((16, 16, 16), None, dataset_size=8, num_workers=4)
    batches = list(ds.batches(4, epoch=0))
    assert len(batches) == 2
    assert batches[0].shape == (4, 16, 16, 16) and batches[0].dtype == np.int32
    # adapter preserves sample content and order
    np.testing.assert_array_equal(batches[0], samples[:4])
    np.testing.assert_array_equal(batches[1], samples[4:])


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


def test_synthetic_batches_distinct_per_process(monkeypatch):
    """Under multi-host each process must draw DIFFERENT rows (the global
    batch is assembled from per-host slices); single-host streams must be
    unchanged by the process fold."""
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        SyntheticGeoDataset,
    )

    ds = SyntheticGeoDataset((8, 8, 8), dataset_size=4, seed=3)
    single = np.asarray(next(ds.batches(4, epoch=0)))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    p0 = np.asarray(next(ds.batches(4, epoch=0)))
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    p1 = np.asarray(next(ds.batches(4, epoch=0)))
    assert not np.array_equal(p0, p1)
    # determinism: same (epoch, process) -> same batch
    np.testing.assert_array_equal(
        p1, np.asarray(next(ds.batches(4, epoch=0))))
    assert single.shape == p0.shape


def test_geogen_indices_distinct_per_process(monkeypatch):
    """GeoGen adapter under simulated 2-process run: disjoint index blocks."""
    import sys
    import types

    import torch

    seen = []

    class RecordingStreaming:
        def __init__(self, model_resolution, model_bounds, dataset_size, device):
            pass

        def __getitem__(self, idx):
            seen.append(idx)
            return torch.zeros((1, 4, 4, 4), dtype=torch.int32)

    pkg = types.ModuleType("geogen")
    mod = types.ModuleType("geogen.dataset")
    mod.GeoData3DStreamingDataset = RecordingStreaming
    pkg.dataset = mod
    monkeypatch.setitem(sys.modules, "geogen", pkg)
    monkeypatch.setitem(sys.modules, "geogen.dataset", mod)

    from flowtrain_stochastic_interpolation_tpu.data.geogen import GeoGenDataset

    ds = GeoGenDataset((4, 4, 4), None, dataset_size=4, num_workers=2)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    list(ds.batches(2, epoch=0))
    idx_p0 = set(seen)
    seen.clear()
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    list(ds.batches(2, epoch=0))
    idx_p1 = set(seen)
    assert idx_p0.isdisjoint(idx_p1), (idx_p0, idx_p1)


def test_maybe_initialize_touches_no_backend(monkeypatch):
    """Deciding 'not distributed' must not initialise the XLA backend —
    jax.process_count() before jax.distributed.initialize() makes every
    later initialize() raise (reproduced live; the r3 review finding)."""
    from flowtrain_stochastic_interpolation_tpu.parallel import maybe_initialize

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)

    def boom():
        raise AssertionError("jax backend touched during detection")

    monkeypatch.setattr(jax, "process_count", boom)
    monkeypatch.setattr(jax, "devices", boom)
    assert maybe_initialize() is False
