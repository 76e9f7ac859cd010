"""Multi-host (DCN) helpers, exercised in their single-process degenerate form.

A real pod can't exist in CI; what CAN be pinned down is that (a) detection
fires exactly when multi-host configuration is present, (b) the per-host
batch feeding path produces the same global arrays as the single-host path
at process_count == 1, and (c) the primary-write guard is sane.  The pod
runbook lives in README.md "Multi-host (pods / DCN)".
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from flowtrain_stochastic_interpolation_tpu.parallel import (
    batch_sharding,
    create_mesh,
    host_local_batch_to_global,
    is_primary,
    maybe_initialize,
    shard_batch,
)
from flowtrain_stochastic_interpolation_tpu.parallel import distributed


def test_maybe_initialize_noop_without_configuration(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    assert maybe_initialize() is False
    assert calls == []


def test_maybe_initialize_detects_env(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: calls.append(k))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert maybe_initialize() is True
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=4, process_id=2)]


def test_maybe_initialize_detects_slurm(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert maybe_initialize() is True
    assert calls == [((), {})]  # argument-free: jax SLURM auto-detection


def test_is_primary_single_process():
    assert is_primary() is True
    assert distributed.process_count() == 1


def test_host_local_batch_matches_device_put_single_process():
    """At process_count == 1 the make_array path must be a plain device_put:
    shard_batch (which routes through it) produces the same values and
    shardings as direct placement."""
    mesh = create_mesh(8)
    batch = np.arange(8 * 4 * 4 * 4, dtype=np.int32).reshape(8, 4, 4, 4)
    out = shard_batch(batch, mesh)
    ref = jax.device_put(jnp.asarray(batch), batch_sharding(mesh, 4))
    assert out.sharding == ref.sharding
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    tree = {"labels": batch, "mask": batch > 10}
    out_tree = host_local_batch_to_global(
        tree, NamedSharding(mesh, P("data"))
    )
    np.testing.assert_array_equal(np.asarray(out_tree["labels"]), batch)
    assert out_tree["mask"].sharding.spec == P("data")
