"""Worker process for the real 2-process multi-host training test.

Launched by ``tests/test_distributed.py::test_two_process_training_step`` as

    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process exposes 4 virtual CPU devices (8 global), wires
``jax.distributed`` over the Gloo CPU collectives backend, and runs the real
``make_shard_map_train_step`` with per-host batch feeding through
``shard_batch`` → ``jax.make_array_from_process_local_data`` — i.e. the exact
multi-controller SPMD path a pod run takes (README "Multi-host (pods / DCN)";
reference analogue: Lightning ``num_nodes`` over SLURM,
``/root/reference/project/geodata-3d-conditional/model_train_sh_inference_cond.py:43-47``).

Prints ``MULTIHOST_OK primary=<bool> losses=<json>`` on success; the parent
asserts both processes print identical losses (the psum crosses processes).
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None  # shared fs, like a pod's NFS

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

# sitecustomize pins the axon TPU plugin via config.update in every process;
# overriding after import (before first backend use) is the escape hatch
# (see tests/conftest.py) and keeps workers off the single TPU grant.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# maybe_initialize must run before anything touches the XLA backend — this
# import chain staying backend-clean is itself part of what the test pins.
from flowtrain_stochastic_interpolation_tpu.parallel import (
    create_mesh,
    is_primary,
    maybe_initialize,
    shard_batch,
)

assert maybe_initialize(), "coordinator env vars set but initialize declined"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc
assert len(jax.local_devices()) == 4
assert is_primary() == (pid == 0)

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
    synthetic_geology_batch,
)
from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
from flowtrain_stochastic_interpolation_tpu.train.shard_map_step import (
    make_shard_map_train_step,
)

from tests.test_train import tiny_config

GLOBAL_BATCH = 8

cfg = tiny_config()
mesh = create_mesh(GLOBAL_BATCH)  # data axis spans both processes (4+4 devices)
model, tx, state = init_train_state(cfg, mesh)

# Every process materialises the same global batch (same key), then feeds
# ONLY its own rows — shard_batch routes them through
# make_array_from_process_local_data to assemble the global jax.Array.
full = np.asarray(
    synthetic_geology_batch(jax.random.PRNGKey(0), GLOBAL_BATCH, cfg.data.shape)
)
rows_per_host = GLOBAL_BATCH // nproc
local = full[pid * rows_per_host : (pid + 1) * rows_per_host]
batch = shard_batch(local, mesh)
assert batch.shape[0] == GLOBAL_BATCH, batch.shape  # global, not per-host

step = make_shard_map_train_step(model, tx, cfg, mesh)
key = jax.device_put(jax.random.PRNGKey(1), NamedSharding(mesh, P()))

losses = []
for _ in range(3):
    state, metrics = step(state, batch, key)
    # train_loss is psum-assembled across ALL devices (both processes) —
    # jax.Arrays here are fully replicated so every process can read them.
    losses.append(float(metrics["train_loss"]))

assert np.isfinite(losses).all(), losses
assert losses[-1] < losses[0], losses  # same batch repeatedly: loss must drop
leaf = jax.tree.leaves(state.params)[0]
assert leaf.sharding.is_fully_replicated

if ckpt_dir is not None:
    # Distributed orbax checkpoint: EVERY process calls save/restore (a
    # primary-only guard would deadlock — train/checkpoint.py's manager is
    # deliberately unguarded; only the host-side config.json is primary-only).
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import (
        CheckpointManager,
    )

    mgr = CheckpointManager(ckpt_dir, cfg, max_to_keep=1, keep_best_on=None)
    mgr.save(3, state)
    mgr.wait()
    restored = mgr.restore(state)  # template supplies shapes + shardings
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    mgr.close()
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))

print(f"MULTIHOST_OK primary={is_primary()} losses={json.dumps(losses)}", flush=True)
