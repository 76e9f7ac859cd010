"""Device-mesh parallelism: sharding-annotated SPMD over ICI/DCN.

Replaces the reference's Lightning DDP/NCCL data parallelism
(``model_train_inference.py:528-537``; SLURM CPU-cluster DDP at
``model_train_sh_inference_cond.py:545-557``) with single-controller JAX:
a ``jax.sharding.Mesh`` whose gradient all-reduce is inserted by XLA from
sharding annotations — no process groups, no explicit collectives in user
code (SURVEY.md §2.6).
"""

from flowtrain_stochastic_interpolation_tpu.parallel.distributed import (
    host_local_batch_to_global,
    is_primary,
    maybe_initialize,
)
from flowtrain_stochastic_interpolation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate_sharding,
    shard_batch,
    spatial_shardings,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "spatial_shardings",
    "maybe_initialize",
    "is_primary",
    "host_local_batch_to_global",
]
