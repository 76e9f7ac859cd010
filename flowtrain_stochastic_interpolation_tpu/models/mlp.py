"""Small velocity MLP for 2D toy experiments.

The reference exercises the interpolant/solver stack on 2D practice
distributions (``src/flowtrain/dataloaders/practicedata.py``) with plots of
ODE trajectories (``utils/plotting.py:229-264``).  This MLP is the minimal
velocity model for those experiments: ``(x [B,2], t [B]) -> dx/dt [B,2]``
with a Fourier time embedding.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn
import jax.numpy as jnp
from jax import Array

from flowtrain_stochastic_interpolation_tpu.models.layers import (
    LearnedFourierEmbedding,
)


class VelocityMLP(nn.Module):
    hidden: Sequence[int] = (128, 128, 128)
    out_dim: int = 2
    time_features: int = 32

    @nn.compact
    def __call__(self, x: Array, t: Array) -> Array:
        temb = LearnedFourierEmbedding(self.time_features, bandwidth=3.0)(t)
        h = jnp.concatenate([x, temb], axis=-1)
        for w in self.hidden:
            h = nn.silu(nn.Dense(w)(h))
        return nn.Dense(self.out_dim)(h)
