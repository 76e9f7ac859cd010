"""Exact align-corners (bi/tri)linear resize as per-axis matmuls.

The reference resamples with ``F.interpolate(mode="trilinear",
align_corners=True)`` (``/root/reference/src/flowtrain/models/unet_attn_3d.py:86,106``).
``jax.image.resize`` uses half-pixel centers, which does NOT match; exact
align-corners semantics are required for pretrained-weight parity (SURVEY.md §7
"hard parts").

Align-corners linear resize is a *linear map per axis*, so we precompute a
dense ``[out, in]`` interpolation matrix per spatial axis and contract it with
an einsum.  On TPU this turns resampling into three small matmuls on the MXU
instead of a gather — both exact and fast.  Matrices are built at trace time
from static shapes and folded into the compiled program as constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import Array


@lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] align-corners linear interpolation matrix."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        # align_corners with a single output sample reads input position 0
        w[0, 0] = 1.0
        return w
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    rows = np.arange(n_out)
    w[rows, lo] = (1.0 - frac).astype(np.float32)
    w[rows, lo + 1] = frac.astype(np.float32)
    return w


# Implementation selector.  The matmul form contracts a [n_out, n_in]
# matrix on the MXU — exact, but K=n_in/N=n_out are far below the 128-lane
# sweet spot (measured ~1 TF/s class at the UNet's 64↔32 sizes).  The gather
# form computes the identical two-tap expression w_lo·x[lo] + w_hi·x[lo+1]
# with static slices + fma on the VPU — bandwidth-bound, and each term is
# the same product-sum as the matrix row, so results are bitwise identical
# in f32.  Measured on TPU v5e (tools/bench_resize.py, b8): gather LOSES
# 1.2–2.7× at every UNet shape (31.4 vs 11.8 ms/round-trip at 64³↔32³ —
# XLA's take lowering is slow even with static indices), so the matmul form
# stays the default.
_USE_GATHER = False


@lru_cache(maxsize=None)
def _resize_taps(n_in: int, n_out: int):
    """(lo, w_lo, w_hi) static align-corners taps for one axis."""
    if n_out == 1 or n_in == 1:
        lo = np.zeros(n_out, np.int64)
        return lo, np.ones(n_out, np.float32), np.zeros(n_out, np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    return lo, 1.0 - frac, frac


def _resize_axis_gather(x: Array, axis: int, n_out: int) -> Array:
    n_in = x.shape[axis]
    lo, w_lo, w_hi = _resize_taps(n_in, n_out)
    shape = [1] * x.ndim
    shape[axis] = n_out
    wl = jnp.asarray(w_lo, x.dtype).reshape(shape)
    wh = jnp.asarray(w_hi, x.dtype).reshape(shape)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(lo + 1).clip(max=n_in - 1), axis=axis)
    return x_lo * wl + x_hi * wh


def resize_linear_nd(x: Array, out_spatial: tuple, spatial_axes: tuple) -> Array:
    """Align-corners linear resize of the given axes to ``out_spatial`` sizes."""
    for axis, n_out in zip(spatial_axes, out_spatial):
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        if _USE_GATHER:
            x = _resize_axis_gather(x, axis, n_out)
            continue
        w = jnp.asarray(_resize_matrix(n_in, n_out), dtype=x.dtype)
        x = jnp.tensordot(w, x, axes=((1,), (axis,)))
        # tensordot puts the contracted-out axis first; move it back.
        x = jnp.moveaxis(x, 0, axis)
    return x


def resize3d(x: Array, scale: float) -> Array:
    """Trilinear align-corners resize of ``[B, X, Y, Z, C]`` by ``scale``.

    Matches ``F.interpolate(x, scale_factor=scale, mode="trilinear",
    align_corners=True)`` including torch's floor-based output sizing.
    """
    spatial = x.shape[1:4]
    out = tuple(int(np.floor(s * scale)) for s in spatial)
    return resize_linear_nd(x, out, (1, 2, 3))


def resize2d(x: Array, scale: float) -> Array:
    """Bilinear align-corners resize of ``[B, H, W, C]`` by ``scale``."""
    spatial = x.shape[1:3]
    out = tuple(int(np.floor(s * scale)) for s in spatial)
    return resize_linear_nd(x, out, (1, 2))


def resize3d_to(x: Array, out_spatial: tuple) -> Array:
    """Trilinear align-corners resize of ``[B, X, Y, Z, C]`` to explicit sizes."""
    return resize_linear_nd(x, tuple(out_spatial), (1, 2, 3))
