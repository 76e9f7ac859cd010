"""Multi-host (DCN) initialisation, per-host data feeding, and write guards.

The reference scales past one node with Lightning ``num_nodes`` over SLURM
(``/root/reference/project/geodata-3d-conditional/model_train_sh_inference_cond.py:43-47,545-557``).
The JAX equivalent (SURVEY.md §2.6 "ICI *and* DCN") is multi-controller SPMD:
every host runs the same program, ``jax.distributed.initialize`` wires the
coordination service, meshes span all hosts' devices (data axis over DCN,
spatial/model axes within a slice's ICI), and each host feeds only its own
slice of the global batch via ``jax.make_array_from_process_local_data``.

On this single-host CI environment the code paths are exercised in their
degenerate form (process_count == 1): :func:`maybe_initialize` is a no-op
without coordinator configuration, :func:`host_local_batch_to_global`
reduces to ``device_put``, and :func:`is_primary` is True.  See
README.md "Multi-host (pods / DCN)" for the pod runbook.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_COORD_ENV = "JAX_COORDINATOR_ADDRESS"


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise ``jax.distributed`` when multi-host configuration is present.

    Resolution order (first hit wins):

    1. explicit arguments;
    2. ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
       environment variables — the generic deployment path;
    3. SLURM (``SLURM_NTASKS`` > 1): ``jax.distributed.initialize()`` with no
       arguments auto-detects SLURM and Cloud-TPU environments.

    Returns True when distributed mode was (or already is) initialised; False
    for plain single-host runs — callers need no branches, every downstream
    helper degrades gracefully at ``process_count() == 1``.

    Must run before anything touches the XLA backend, so this function itself
    makes NO JAX calls when deciding (``jax.process_count()`` would initialise
    the local backend and make a later ``jax.distributed.initialize`` raise).
    A launcher that already initialised distributed mode is detected by
    catching the double-initialise error.
    """
    def _init(**kwargs) -> bool:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # double call: the launcher (or a previous maybe_initialize)
            # already wired the coordination service — that's success
            if "already" in str(e) or "once" in str(e):
                return True
            raise
        return True

    if coordinator_address is not None:
        return _init(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    if os.environ.get(_COORD_ENV):
        return _init(
            coordinator_address=os.environ[_COORD_ENV],
            num_processes=_int_env("JAX_NUM_PROCESSES", num_processes),
            process_id=_int_env("JAX_PROCESS_ID", process_id),
        )

    if int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        return _init()  # SLURM auto-detection

    return False


def _int_env(name: str, fallback: Optional[int]) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else fallback


def is_primary() -> bool:
    """True on the process that should own host-side writes (metrics CSV,
    wandb, images).  Orbax checkpointing must NOT be guarded by this — every
    process participates in a distributed checkpoint and a primary-only call
    would deadlock the others (orbax coordinates internally; with fully
    replicated params only process 0 actually writes array data)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def host_local_batch_to_global(batch, sharding):
    """Assemble a globally-sharded array from this host's local batch slice.

    Multi-host: each process passes only its own ``global_batch /
    process_count`` rows and ``jax.make_array_from_process_local_data``
    builds the global ``jax.Array`` without any cross-host copy of data a
    host doesn't own.  Single-host: plain ``device_put`` (identical result).
    """
    def put(x):
        sh = sharding(np.ndim(x)) if callable(sharding) else sharding
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
