"""Multi-host (DCN) helpers: single-process degenerate forms AND a real
2-process integration test.

The degenerate tests pin down that (a) detection fires exactly when
multi-host configuration is present, (b) the per-host batch feeding path
produces the same global arrays as the single-host path at
process_count == 1, and (c) the primary-write guard is sane.

``test_two_process_training_step`` then runs the genuine article: two
separate processes × 4 virtual CPU devices, ``jax.distributed`` over Gloo,
per-host batch feeding, and the shard_map train step whose psum crosses the
process boundary — the closest a single box gets to a pod.  The pod runbook
lives in README.md "Multi-host (pods / DCN)".
"""

import pytest

pytestmark = pytest.mark.slow  # real 2-process Gloo integration (~1 min); fast tier = -m "not slow"
import os
import socket
import subprocess
import sys

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


def test_package_import_leaves_backend_uninitialized():
    """``jax.distributed.initialize`` must precede any XLA backend use, so
    importing the package (e.g. to reach ``maybe_initialize``) must not
    create backends.  Regression: the solver tableaux used to materialise
    ``jnp`` constants at import time, which broke every multi-host entry."""
    code = (
        "import jax\n"
        "import flowtrain_stochastic_interpolation_tpu\n"
        "from jax._src import xla_bridge\n"
        "assert not getattr(xla_bridge, '_backends', {}), "
        "list(xla_bridge._backends)\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr


def test_two_process_training_step(tmp_path):
    """Real multi-controller SPMD on one box: 2 processes × 4 CPU devices,
    Gloo cross-process collectives, per-host batch feeding, shard_map train
    step, distributed orbax save/restore on a shared directory.  Both
    processes must observe identical (finite, decreasing) global losses —
    the psum genuinely crossed the process boundary."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4, not 8)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port),
             str(tmp_path / "ckpt")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    lines = [
        [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")]
        for out in outs
    ]
    assert lines[0] and lines[1], outs
    assert "primary=True" in lines[0][0] and "primary=False" in lines[1][0]
    # identical global losses on both controllers, bit for bit
    assert lines[0][0].split("losses=")[1] == lines[1][0].split("losses=")[1]
