"""flowtrain-tpu: a TPU-native stochastic-interpolation framework.

A ground-up JAX/Flax/optax/Pallas rebuild of the capabilities of
``chipnbits/flowtrain_stochastic_interpolation`` (reference layer map in
SURVEY.md §1): interpolant schedules, ODE/SDE samplers, 2D/3D attention
UNets (unconditional + conditional), categorical simplex embedding,
borehole/surface masking, ensemble analysis, and a data-parallel training
stack over ``jax.sharding.Mesh``.

Design stance (not a port):
  * functional core — pure jittable functions over pytrees
  * channels-last ``[B, X, Y, Z, C]`` layout (XLA/TPU native)
  * ``lax.scan`` fixed-NFE samplers + a jittable adaptive dopri5
  * ``optax`` training chain + EMA shadow tree + orbax checkpoints
  * DP via sharded ``jit`` over a device mesh; Pallas kernels for hot attention
"""

from flowtrain_stochastic_interpolation_tpu import (  # noqa: F401
    interpolants,
    solvers,
)

__version__ = "0.1.0"
