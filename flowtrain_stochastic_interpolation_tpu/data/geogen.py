"""GeoGen (StructuralGeo) adapter — the reference's real data source.

The reference depends on ``GeoGen @ StructuralGeo v1.0`` (``pyproject.toml:25``)
whose ``GeoData3DStreamingDataset`` generates synthetic geology on CPU
workers.  GeoGen stays an optional host-side dependency here (exactly as in
the reference); when absent, :mod:`.synthetic` provides a device-native
stand-in with the same category convention.

Use :func:`get_dataset` to resolve the configured source.
"""

from __future__ import annotations

import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import DataConfig
from flowtrain_stochastic_interpolation_tpu.data.synthetic import SyntheticGeoDataset


def geogen_available() -> bool:
    try:
        import geogen  # noqa: F401

        return True
    except ImportError:
        return False


class GeoGenDataset:
    """Wraps GeoGen's streaming dataset behind the same ``batches`` API.

    Host-side generation (GeoGen is numpy/CPU); batches are stacked on host
    and shipped to device by the caller.  Reference call signature:
    ``GeoData3DStreamingDataset(model_resolution, model_bounds, dataset_size,
    device)`` (``model_train_inference.py:249-254``).
    """

    host_side = True  # numpy batches generated on host CPU workers

    def __init__(
        self,
        model_resolution: Tuple[int, int, int],
        model_bounds,
        dataset_size: int,
        n_categories: int = 15,
        seed: int = 0,
        num_workers: int = 16,
        prefetch_depth: int = 2,
    ):
        self._ctor_kwargs = dict(
            model_resolution=model_resolution,
            model_bounds=model_bounds,
            dataset_size=dataset_size,
            device="cpu",
        )
        # One GeoData3DStreamingDataset per worker thread.  The reference
        # isolates generation in DataLoader worker *processes*; GeoGen's
        # __getitem__ is not documented thread-safe (torch global RNG, model
        # builders), so sharing one instance across the pool could race.
        # Per-index determinism is GeoGen's own contract (streaming datasets
        # derive each sample from its index), so per-thread instances return
        # identical samples for identical indices.
        self._local = threading.local()
        self._local.ds = self._make_ds()  # eager: validate geogen import/config
        self.model_resolution = tuple(model_resolution)
        self.dataset_size = dataset_size
        self.n_categories = n_categories
        self.num_workers = num_workers
        self.prefetch_depth = prefetch_depth

    def _make_ds(self):
        from geogen.dataset import GeoData3DStreamingDataset  # type: ignore

        return GeoData3DStreamingDataset(**self._ctor_kwargs)

    def _thread_ds(self):
        ds = getattr(self._local, "ds", None)
        if ds is None:
            ds = self._local.ds = self._make_ds()
        return ds

    def __len__(self) -> int:
        return self.dataset_size

    def __getitem__(self, idx: int) -> np.ndarray:
        sample = self._thread_ds()[idx]  # [1, X, Y, Z] torch tensor
        return np.asarray(sample.squeeze(0).cpu().numpy(), dtype=np.int32)

    def batches(self, batch_size: int, epoch: int = 0) -> Iterator[np.ndarray]:
        """Prefetched batches: per-sample generation on a thread pool (the
        reference's 16 dataloader workers) with 2 batches kept ahead of the
        consumer (``model_train_inference.py:255-260`` done host-natively)."""
        from flowtrain_stochastic_interpolation_tpu.data.prefetch import (
            parallel_map_batches,
        )

        n_batches = max(self.dataset_size // batch_size, 1)
        # per-host disjoint index blocks: the global batch under multi-host is
        # process_count × batch_size rows (make_array_from_process_local_data),
        # so each process must draw from its own block — (epoch, process) maps
        # to a unique stride of dataset_size indices.  Single-host (the CI
        # form) reduces to the plain epoch * dataset_size + i layout.
        import jax as _jax

        block = epoch * _jax.process_count() + _jax.process_index()
        index_lists = [
            [block * self.dataset_size + i * batch_size + j for j in range(batch_size)]
            for i in range(n_batches)
        ]
        yield from parallel_map_batches(
            self.__getitem__,
            index_lists,
            lambda items: np.stack(items, axis=0),
            num_workers=self.num_workers,
            depth=self.prefetch_depth,
        )


def get_dataset(cfg: DataConfig, seed: int = 0):
    """Resolve the configured data source ('geogen' with synthetic fallback)."""
    if cfg.source == "geogen":
        if geogen_available():
            return GeoGenDataset(
                cfg.shape, cfg.bounds, cfg.epoch_size, cfg.num_categories, seed
            )
        import warnings

        warnings.warn("GeoGen not installed; falling back to synthetic generator")
    return SyntheticGeoDataset(
        cfg.shape, cfg.bounds, cfg.epoch_size, cfg.num_categories, seed
    )
