"""Mesh creation and sharding helpers.

Parallelism plan (SURVEY.md §2.6): the reference's only strategy is data
parallelism (Lightning DDP).  Here DP is the default axis; an optional
``spatial`` axis supports sharding the voxel grid for >64³ volumes (the
volumetric analogue of context parallelism) — convolution halo exchange and
attention collectives are then inserted by XLA from the annotations.

Params stay replicated (31M-param UNets need no TP); batches shard over
``data``.  All helpers work identically on a real TPU slice and on the
CPU-simulated 8-device mesh used by the test suite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ``(data[, spatial])`` mesh over the available devices.

    ICI topology ordering is preserved by using ``jax.devices()`` order (XLA
    enumerates devices so that neighbours are ICI-adjacent on a slice).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (
        f"requested {n_data}x{n_spatial} devices, have {len(devices)}"
    )
    devs = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    if n_spatial == 1:
        return Mesh(devs.reshape(-1), ("data",))
    return Mesh(devs, ("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch axis over ``data`` (and, if present, the first
    spatial axis over ``spatial``)."""
    spec = ["data"] + [None] * (ndim - 1)
    if "spatial" in mesh.axis_names and ndim >= 2:
        spec[1] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a (pytree of) host array(s) with the batch axis sharded on ``data``.

    Multi-host aware: under ``jax.distributed`` each process passes its *own*
    per-host slice of the global batch and the global array is assembled via
    ``make_array_from_process_local_data`` (``parallel/distributed.py``);
    single-host reduces to a plain ``device_put``.
    """
    from flowtrain_stochastic_interpolation_tpu.parallel.distributed import (
        host_local_batch_to_global,
    )

    return host_local_batch_to_global(batch, lambda ndim: batch_sharding(mesh, ndim))


def spatial_shardings(mesh: Mesh, ndim: int) -> NamedSharding:
    """Activation sharding for volumetric tensors [B, X, Y, Z, C]: batch on
    ``data``, X on ``spatial`` when the mesh has one."""
    return batch_sharding(mesh, ndim)
