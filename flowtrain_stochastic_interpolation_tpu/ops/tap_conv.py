"""Tap-folded implicit-GEMM 3³ convolution (Pallas, TPU).

Why this kernel exists.  The flagship UNet's hot path is ~57 NDHWC 3³ convs
at 48–96 channels (reference architecture:
``/root/reference/src/flowtrain/models/unet_attn_3d.py:222-278`` — every
``Block`` is a 3³ conv).  XLA's direct conv runs them at ~27 TF/s on v5e
because it issues per-tap GEMMs whose *contraction depth* K = C = 48 and
*lane width* N = C = 48 both underfill the 128×128 MXU: 197 × (48/128)² ≈ 27.
Folding 9 taps of the (dy, dz) plane into the contraction (K = 9·C = 432)
removes the depth underfill; a VMEM-resident probe (``tools/bench_mxu_shapes.py``,
2026-08-18) measures:

    K=48,  N=48:  12.5 TF/s   (naive per-tap dots — worse than XLA)
    K=432, N=48:  62.1 TF/s   (this kernel's GEMM shape)
    K=1296,N=48:  56.8 TF/s   (all 27 taps folded — more VPU build traffic)
    K=1296,N=128: 165.7 TF/s  (lane-fill control; validates the 48/128 model)

The round-2 probe that "ruled out" a hand-written conv streamed its patch
matrix from HBM (≈50 FLOP/byte ⇒ bandwidth-bound ≈40 TF/s) — it measured the
materialised-im2col form, not this one.  Here the patch matrix never exists
in HBM: each grid step holds an input tile (with +1 halo, spatially pre-
padded by the caller) in VMEM, builds `[M, 9C]` patch rows with 9 shifted
VMEM copies, and accumulates 3 x-tap dots `[M, 9C] @ [9C, C_out]`.

Numerics match ``lax.conv_general_dilated`` (stride 1, SAME): bf16 operands,
f32 accumulation, one rounding to the output dtype.

**Measured verdict (v5e, 2026-08-18, ``tools/bench_tap_conv.py``): an
experiment, not a production path.**  At the flagship train shape
([8, 64³, 48→48]) the kernel sustains 29.2 TF/s vs XLA's 34.6 — the GEMM
itself hits the probe's 62 TF/s, but patch building and per-grid-step
overhead bind at ~8 ms/conv (ablation: patch build alone ~8 ms, dots alone
~8 ms, together ~9 ms; Element-indexed halo DMA costs ~2.5 ms of that —
plain Blocked specs measured 6.50 vs 9.03 ms and still lose).  It wins only
at 128³ b1 (1.38×), where the simpler z2-packed form
(:mod:`..ops.packed_conv`) achieves the same rate — so nothing dispatches
here in production; the kernel stays as the measured record of the
tap-folding approach, exercised by interpret-mode tests
(``tests/test_tap_conv.py``).

Supported: kernel 3³, stride 1, SAME, X and Y multiples of 8, Z a multiple
of 8, C_out ≤ 128 (lane width), any C_in, any batch.  The eligibility check
(:func:`use_tap_conv`) is shape validity only — no model code calls it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# output-tile extents; 8×8 xy tiles keep the in-block + patch + acc within
# VMEM (~7 MB incl. double buffering) while giving M = 8·8·bz ≥ 1024 GEMM rows
_BX = 8
_BY = 8


def _pick_bz(z: int) -> int:
    """z-chunk (multiple of 8) dividing Z — M = 8·8·bz rows per dot.

    16 keeps patch+acc+blocks within VMEM at every supported channel count
    (bz=32 OOMs the 128³ case); 1024 rows already amortise the MXU pipeline.
    """
    for bz in (16, 8):
        if z % bz == 0:
            return bz
    raise ValueError(f"Z={z} must be a multiple of 8 for tap_conv3d")


def _fwd_kernel(xp_ref, w_ref, b_ref, o_ref, patch_ref, *, bz: int, cin: int,
                cout: int, zc_total: int, acc_dtype):
    """One (batch, x-tile, y-tile) step: build patches, 3 x-tap dots per z-chunk.

    xp_ref: [1, BX+2, BY+2, Z+2, Cin]  (spatially pre-padded input tile)
    w_ref:  [3, 9*Cin, Cout]           (x-tap major; (dy, dz, c) folded into K)
    b_ref:  [1, Cout]
    o_ref:  [1, BX, BY, Z, Cout]
    patch_ref (scratch): [BX+2, BY, bz, 9*Cin]
    """
    kf = 9 * cin
    m = _BX * _BY * bz
    for zc in range(zc_total):
        # --- patch build: 9 shifted copies (dy, dz) ---------------------
        for dy in range(3):
            for dz in range(3):
                t = dy * 3 + dz
                src = xp_ref[0, :, pl.ds(dy, _BY), pl.ds(dz + zc * bz, bz), :]
                patch_ref[:, :, :, pl.ds(t * cin, cin)] = src
        # --- 3 x-tap dots, accumulated in f32 ---------------------------
        acc = jnp.zeros((m, cout), jnp.float32)
        for dx in range(3):
            a = patch_ref[pl.ds(dx, _BX)].reshape(m, kf)
            acc += jax.lax.dot_general(
                a, w_ref[dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc += b_ref[0].astype(jnp.float32)
        o_ref[0, :, :, pl.ds(zc * bz, bz), :] = (
            acc.reshape(_BX, _BY, bz, cout).astype(o_ref.dtype)
        )


def _fold_weights(w: Array) -> Array:
    """[3,3,3,Cin,Cout] → [3, 9*Cin, Cout] with (dy, dz, c) K-order."""
    k = w.shape
    return w.reshape(3, 9 * k[3], k[4])


@functools.partial(jax.jit, static_argnames=())
def _tap_conv3d_fwd(x: Array, w: Array, b: Array) -> Array:
    batch, xs, ys, zs, cin = x.shape
    cout = w.shape[-1]
    bz = _pick_bz(zs)
    zc_total = zs // bz
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wf = _fold_weights(w).astype(x.dtype)
    bb = b.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(
        _fwd_kernel, bz=bz, cin=cin, cout=cout, zc_total=zc_total,
        acc_dtype=jnp.float32,
    )
    grid = (batch, xs // _BX, ys // _BY)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(_BX + 2), pl.Element(_BY + 2),
                 pl.Element(zs + 2), pl.Element(cin)),
                lambda nb, i, j: (nb, i * _BX, j * _BY, 0, 0),
            ),
            pl.BlockSpec((3, 9 * cin, cout), lambda nb, i, j: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda nb, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _BX, _BY, zs, cout), lambda nb, i, j: (nb, i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((batch, xs, ys, zs, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((_BX + 2, _BY, bz, 9 * cin), x.dtype),
        ],
    )(xp, wf, bb)


def _dw_kernel(xp_ref, g_ref, dw_ref, patch_ref, *, bz: int, cin: int,
               cout: int, zc_total: int):
    """Accumulates dw[dx, (dy,dz,c), co] = Σ_m patch[m, (dy,dz,c)] · g[m, co].

    Output block is revisited with a constant index map; the TPU grid is
    sequential, so read-modify-write accumulation across steps is sound.
    """
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    kf = 9 * cin
    m = _BX * _BY * bz
    for zc in range(zc_total):
        for dy in range(3):
            for dz in range(3):
                t = dy * 3 + dz
                src = xp_ref[0, :, pl.ds(dy, _BY), pl.ds(dz + zc * bz, bz), :]
                patch_ref[:, :, :, pl.ds(t * cin, cin)] = src
        g = g_ref[0, :, :, pl.ds(zc * bz, bz), :].reshape(m, cout)
        for dx in range(3):
            a = patch_ref[pl.ds(dx, _BX)].reshape(m, kf)
            dw_ref[dx] += jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _tap_conv3d_dw(x: Array, g: Array) -> Array:
    """Weight gradient: correlation of (pre-padded) x with g → [3,3,3,Cin,Cout]."""
    batch, xs, ys, zs, cin = x.shape
    cout = g.shape[-1]
    bz = _pick_bz(zs)
    zc_total = zs // bz
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(
        _dw_kernel, bz=bz, cin=cin, cout=cout, zc_total=zc_total,
    )
    grid = (batch, xs // _BX, ys // _BY)
    dwf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(_BX + 2), pl.Element(_BY + 2),
                 pl.Element(zs + 2), pl.Element(cin)),
                lambda nb, i, j: (nb, i * _BX, j * _BY, 0, 0),
            ),
            pl.BlockSpec((1, _BX, _BY, zs, cout), lambda nb, i, j: (nb, i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 9 * cin, cout), lambda nb, i, j: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 9 * cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BX + 2, _BY, bz, 9 * cin), x.dtype),
        ],
    )(xp, g)
    # [3, (dy,dz,c), co] → [3,3,3,Cin,Cout]
    return dwf.reshape(3, 3, 3, cin, cout)


@jax.custom_vjp
def tap_conv3d(x: Array, w: Array, b: Array) -> Array:
    """3³ stride-1 SAME conv, NDHWC, tap-folded Pallas kernel.

    Drop-in numerics for ``lax.conv_general_dilated`` with bf16/f32 inputs
    and f32 accumulation.  See module docstring for the performance model.
    """
    return _tap_conv3d_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _tap_conv3d_fwd(x, w, b), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    # dx: SAME conv of g with the spatially-flipped, channel-transposed kernel
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _tap_conv3d_fwd(g, w_flip.astype(g.dtype),
                         jnp.zeros((w.shape[3],), jnp.float32))
    dw = _tap_conv3d_dw(x, g).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2, 3)).astype(jnp.float32)
    return dx.astype(x.dtype), dw, db


tap_conv3d.defvjp(_vjp_fwd, _vjp_bwd)


def use_tap_conv(spatial: tuple, cin: int, cout: int, kernel: int,
                 dtype=None) -> bool:
    """Eligibility: 3³ kernel, xy tiles of 8, z multiple of 8, C_out ≤ 128."""
    if kernel != 3 or len(spatial) != 3:
        return False
    xs, ys, zs = spatial
    if xs % _BX or ys % _BY or zs % 8:
        return False
    if cout > 128:
        return False
    # patch scratch must fit VMEM: (BX+2)·BY·bz·9·Cin ≤ ~4M bf16 elements
    if cin > 256:
        return False
    return True
