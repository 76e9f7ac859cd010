"""Phase-fat convolution: MXU-shaped reformulation of small-channel 3D convs.

The flagship UNet's hot convolutions have C_out = 48 (stage 0/1) — 48 of the
MXU's 128 output lanes — and XLA's direct conv tops out near 27 TFLOP/s on
them while the same hardware runs 100–180 TFLOP/s once the output feature
dimension is ≥ 384 (measured: tools/bench_conv_variants.py,
tools/bench_gemm_probe.py).  This module rewrites a stride-1 'SAME' k³ conv
**exactly** as:

    stride-2 conv, kernel (k+1)³, C_out' = 8·C_out   (one copy of the fine
    kernel per output parity phase, zero-padded into the enlarged window)
    →  depth-to-space [2,2,2] back to the fine grid.

Every multiply-add of the original conv appears exactly once (the enlarged
kernel holds the fine kernel shifted by the phase offset; the (k+1)³ window
covers each phase's k³ support), so the result matches the direct conv to
float-reassociation tolerance while filling the MXU lanes: C_out' = 384 for
the 48-channel stages.  FLOP overhead is ((k+1)/k)³ ≈ 2.37× (k=3) / 1.49×
(k=7), repaid ~4-7× by the efficiency gain.

Used by :func:`models.layers.conv_nd` for even-sized 3-D inputs with
C_out ≤ 96; reference semantics unchanged (``unet_attn_3d.py:83,535``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array, lax


def fat_conv3d(x: Array, kernel: Array, bias: Optional[Array] = None,
               *, precision=None) -> Array:
    """Stride-1 'SAME' 3-D conv of ``[B, X, Y, Z, C_in]`` (all spatial dims
    even) computed as a phase-fat strided conv.  ``kernel``: ``[k, k, k,
    C_in, C_out]`` with odd ``k``.  Numerically equivalent to
    ``lax.conv_general_dilated(x, kernel, (1,1,1), 'SAME')``.
    """
    k = kernel.shape[0]
    h = k // 2
    ci, co = kernel.shape[3], kernel.shape[4]
    b, xs, ys, zs, _ = x.shape
    assert xs % 2 == ys % 2 == zs % 2 == 0, "fat_conv3d needs even spatial dims"

    # enlarged kernel: [(k+1)³, ci, 8, co]; phase (fx, fy, fz) holds the fine
    # kernel shifted by its offset inside the 2³ output patch
    wp = jnp.zeros((k + 1, k + 1, k + 1, ci, 8, co), kernel.dtype)
    for fx in (0, 1):
        for fy in (0, 1):
            for fz in (0, 1):
                phase = (fx * 2 + fy) * 2 + fz
                wp = wp.at[fx:fx + k, fy:fy + k, fz:fz + k, :, phase, :].set(kernel)
    wp = wp.reshape(k + 1, k + 1, k + 1, ci, 8 * co)

    out = lax.conv_general_dilated(
        x, wp, (2, 2, 2), ((h, h), (h, h), (h, h)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )  # [B, X/2, Y/2, Z/2, 8*co]

    # depth-to-space: channel phase -> fine position
    out = out.reshape(b, xs // 2, ys // 2, zs // 2, 2, 2, 2, co)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, xs, ys, zs, co)
    if bias is not None:
        out = out + bias
    return out


def use_fat_conv(spatial, c_out: int, kernel: int) -> bool:
    """Measured gate (tools/bench_fat_conv.py, TPU v5e): the fat form wins
    2.25× on the 7³ init conv (68.9 → 30.6 ms at b8) but loses slightly on
    3³ convs, where XLA's direct stride-2 lowering is weaker — so only k=7
    qualifies for now."""
    return (
        len(spatial) == 3
        and all(s % 2 == 0 and s >= 16 for s in spatial)
        and c_out <= 96
        and kernel == 7
    )
