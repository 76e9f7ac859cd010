"""Observation-operator masks: boreholes + surface (vectorised, jittable).

Rebuilds ``/root/reference/project/geodata-3d-conditional/boreholes.py`` —
the forward operator A for the conditional inverse problem — without the
per-batch-item Python loops the reference runs inside its training step
(``boreholes.py:45-108``; flagged as a CPU-bound perf hazard in SURVEY.md
§3.3).  All masks here are fixed-shape, vmappable, and run on device.

Semantics preserved:

* **boreholes** (``make_boreholes_mask``, ref ``:45-73``): per batch item,
  ``n_bores ~ U{8..31}``; a jittered ⌊√n⌋ × ⌈n/⌊√n⌋⌉ grid of (x, y) points
  (ref ``_jittered_grid_points``, ``:9-42``); full-depth vertical columns.
* **surface** (``make_surface_mask``, ref ``:75-108``): topmost z-slice, every
  air voxel (category -1), and the voxel immediately below each air voxel.
* **combined** = OR (ref ``:111-126``).
* **reduced** variants (ref ``:128-190``): boreholes only extend 16 voxels
  below the lowest air voxel of their column.  (The reference checks column
  membership with independent x/y tests — a latent bug; here a column
  qualifies iff it actually contains air.)

Masks are returned channels-last ``[B, X, Y, Z]`` bool; broadcast against
``[B, X, Y, Z, E]`` data with ``mask[..., None]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

# n_bores < 32 ⇒ grid is at most floor(sqrt(31))=5 by ceil(31/5)=7 cells.
_MAX_GRID = 8


def _jittered_grid_xy(key: Array, size_x: int, size_y: int, n_bores: Array):
    """Fixed-shape jittered grid points; entries beyond ``n_bores`` flagged invalid.

    Reproduces reference ``_jittered_grid_points`` (``boreholes.py:9-42``):
    n_x = floor(sqrt(n)), n_y = ceil(n/n_x); cell centres + U(-w/2, w/2)
    jitter; clamp to [0, size-1]; truncate row-major to n points.
    """
    n = n_bores.astype(jnp.float32)
    n_x = jnp.floor(jnp.sqrt(n))
    n_y = jnp.ceil(n / n_x)
    cell_w_x = size_x / n_x
    cell_w_y = size_y / n_y

    ii = jax.lax.broadcasted_iota(jnp.int32, (_MAX_GRID, _MAX_GRID), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_MAX_GRID, _MAX_GRID), 1)
    u = jax.random.uniform(key, (2, _MAX_GRID, _MAX_GRID))

    px = (ii + 0.5) * cell_w_x + (u[0] * cell_w_x - cell_w_x / 2.0)
    py = (jj + 0.5) * cell_w_y + (u[1] * cell_w_y - cell_w_y / 2.0)
    px = jnp.clip(px, 0.0, size_x - 1).astype(jnp.int32)
    py = jnp.clip(py, 0.0, size_y - 1).astype(jnp.int32)

    # row-major rank within the active n_x × n_y grid, truncated to n_bores
    flat_rank = ii * n_y.astype(jnp.int32) + jj
    valid = (jj < n_y) & (ii < n_x) & (flat_rank < n_bores)
    return px.reshape(-1), py.reshape(-1), valid.reshape(-1)


def _scatter_columns(px, py, valid, size_x, size_y):
    plane = jnp.zeros((size_x, size_y), dtype=bool)
    return plane.at[px, py].max(valid)


def make_boreholes_mask(key: Array, shape, n_bores_range=(8, 32)) -> Array:
    """Bool mask ``[B, X, Y, Z]`` of full-depth vertical borehole columns."""
    b, size_x, size_y, size_z = shape
    keys = jax.random.split(key, b)
    lo, hi = n_bores_range

    def per_item(k):
        k_n, k_grid = jax.random.split(k)
        n_bores = jax.random.randint(k_n, (), lo, hi)
        px, py, valid = _jittered_grid_xy(k_grid, size_x, size_y, n_bores)
        return _scatter_columns(px, py, valid, size_x, size_y)

    planes = jax.vmap(per_item)(keys)  # [B, X, Y]
    return jnp.broadcast_to(planes[..., None], (b, size_x, size_y, size_z))


def make_surface_mask(batch: Array, air_value: int = -1) -> Array:
    """Surface observation mask from categorical data ``[B, X, Y, Z]``.

    Top z-slice ∪ air voxels ∪ voxel directly below each air voxel
    (reference ``boreholes.py:75-108``, fully vectorised).
    """
    air = batch == air_value
    # "immediately lower neighbour along z" = index z-1 of each air voxel
    below = jnp.concatenate([air[..., 1:], jnp.zeros_like(air[..., :1])], axis=-1)
    top = jnp.zeros_like(air).at[..., -1].set(True)
    return air | below | top


def make_combined_mask(key: Array, batch: Array, air_value: int = -1) -> Array:
    """Boreholes ∪ surface (reference ``make_combined_mask``, ``:111-126``)."""
    bh = make_boreholes_mask(key, batch.shape)
    return bh | make_surface_mask(batch, air_value)


def _column_air_start(batch: Array, air_value: int) -> Array:
    """Per-(x,y) lowest air z-index, or Z where a column has no air."""
    air = batch == air_value
    z = batch.shape[-1]
    zidx = jnp.arange(z)
    return jnp.min(jnp.where(air, zidx, z), axis=-1)  # [B, X, Y]


def make_boreholes_reduced_mask(
    key: Array, batch: Array, air_value: int = -1, n_bores_range=(8, 64), depth: int = 16
) -> Array:
    """Boreholes starting ``depth`` voxels below the surface + air voxels.

    Reference ``make_boreholes_reduced_mask`` (``boreholes.py:166-190``);
    columns without air carry no borehole (see module docstring on the
    reference's membership-test quirk).
    """
    b, size_x, size_y, size_z = batch.shape
    air = batch == air_value
    min_z = _column_air_start(batch, air_value)  # [B, X, Y]
    has_air = min_z < size_z

    bh_cols = make_boreholes_mask(key, batch.shape, n_bores_range)[..., 0]  # [B, X, Y]
    z_start = jnp.maximum(min_z - depth, 0)
    zidx = jnp.arange(size_z)[None, None, None, :]
    columns = (zidx >= z_start[..., None]) & (bh_cols & has_air)[..., None]
    return air | columns


def make_combined_reduced_mask(
    key: Array, batch: Array, air_value: int = -1, n_bores_range=(8, 64), depth: int = 16
) -> Array:
    """Reduced boreholes ∪ (air + one-below) (reference ``:128-164``)."""
    air = batch == air_value
    below = jnp.concatenate([air[..., 1:], jnp.zeros_like(air[..., :1])], axis=-1)
    return make_boreholes_reduced_mask(key, batch, air_value, n_bores_range, depth) | air | below
