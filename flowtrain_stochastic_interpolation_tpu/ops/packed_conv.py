"""z2-packed 3³ convolution: lane-filling layout transform for narrow convs.

Why.  The flagship UNet's dominant cost is 3³ convs at 48 channels
(reference architecture ``/root/reference/src/flowtrain/models/unet_attn_3d.py:222-278``
— every ``Block`` body is a 3³ conv at dim=48 on the two largest grids).
On TPU, XLA lowers a direct NDHWC conv to per-tap GEMMs whose contraction
depth K = C_in and lane width N = C_out; at C = 48 both underfill the
128-wide MXU and the conv sustains only ~33 TF/s on v5e (measured
2026-08-18, ``tools/bench_tap_conv.py``), while the same conv at C = 128
sustains 145 TF/s.

Fix.  Pack pairs of adjacent z-sites into channels: ``[..., Z, C] →
[..., Z/2, 2C]``.  Because z is the second-minor axis of NDHWC, this is a
**free reshape** (identical memory bytes — no transpose, no copy).  The 3³
conv on the original volume is exactly a 3³ conv on the packed volume with
a block-structured ``[3,3,3,2C,2C]`` weight built from the original
``[3,3,3,C,C]``: output phase φo at packed site q is original site 2q+φo,
whose z-taps 2q+φo+δ live in packed sites q−1..q+1 at phases (φo+δ) mod 2.
Half the packed-weight entries are structurally zero, so the packed conv
does 2× the FLOPs — but at the C=96 lane-filled rate that is still a net
win: chain-slope measured 6.29 ms vs 7.91 ms forward (1.26×) and 1.12×
fwd+bwd at the flagship [8, 64³, 48] shape, 1.31× both ways at 128³ b1
(``tools/bench_packed_conv.py``).

Boundary semantics are exact: packed SAME padding zero-fills packed site
−1, whose phase-1 slot is original z = −1 (the original SAME pad) and
whose phase-0 slot (z = −2) only ever meets a structural zero weight.

The packing einsum is differentiable, so autodiff through
:func:`packed_conv3d` yields exact gradients w.r.t. the *original* weight
layout (structural-zero slots contribute nothing), and the backward convs
run in the packed (lane-filled) shape class as well.

Dispatch is measurement-driven (:func:`use_packed_conv`): only shape
classes where the packed form won an on-TPU A/B take this path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _z2_selector(dtype) -> Array:
    """Constant [3, 2, 2, 3] selector: sel[p, φi, φo, δ+1] = 1 when packed
    tap p (offset p−1) at input phase φi feeds output phase φo through
    original z-tap δ = 2(p−1) + φi − φo ∈ {−1, 0, 1}."""
    sel = np.zeros((3, 2, 2, 3), np.float32)
    for p in range(3):
        for phi in range(2):
            for pho in range(2):
                dz = 2 * (p - 1) + phi - pho
                if -1 <= dz <= 1:
                    sel[p, phi, pho, dz + 1] = 1.0
    return jnp.asarray(sel, dtype)


def pack_weights_z2(w: Array) -> Array:
    """[3, 3, 3, Ci, Co] → [3, 3, 3, 2Ci, 2Co] dense z2-packed weights.

    ``W2[dx, dy, p, φi·Ci+ci, φo·Co+co] = W[dx, dy, 2(p−1)+φi−φo+1, ci, co]``
    where in range, else 0.  Differentiable (a fixed 0/1 contraction), so the
    packed conv's weight gradient maps back to the original layout for free.
    """
    ci, co = w.shape[3], w.shape[4]
    sel = _z2_selector(w.dtype)
    w2 = jnp.einsum("pfgd,xydio->xypfigo", sel, w)
    return w2.reshape(3, 3, 3, 2 * ci, 2 * co)


def packed_conv3d(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """3³ stride-1 SAME conv in the z2-packed layout.

    ``x``: [B, X, Y, Z, C] (Z even), ``w``: [3, 3, 3, C_in, C_out] in the
    ordinary layout (packing happens inside).  Numerics match
    ``lax.conv_general_dilated`` up to bf16 accumulation order.
    """
    bsz, xs, ys, zs, cin = x.shape
    cout = w.shape[-1]
    w2 = pack_weights_z2(w)
    xp = x.reshape(bsz, xs, ys, zs // 2, 2 * cin)
    y = jax.lax.conv_general_dilated(
        xp, w2, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    y = y.reshape(bsz, xs, ys, zs, cout)
    return y if b is None else y + b


def use_packed_conv(shape: Tuple[int, ...], cin: int, cout: int,
                    kernel: int) -> bool:
    """Shape classes where the z2-packed form measured faster than direct.

    ``shape`` is ``(B, X, Y, Z)``.  On-TPU A/B over every flagship conv
    class, fwd and fwd+bwd (v5e, 2026-08-18, ``tools/bench_packed_conv.py``);
    the separating predictor is **grid size, not voxel count**:

    - 48→48 on ≥64³ grids wins at every measured batch: b1 128³
      1.32×/1.31×, b1 64³ 1.10×/1.21×, b2 64³ 1.46×/1.43×, b4 64³
      1.29×/1.25×, b8 64³ 1.26×/1.12×, b16 64³ 1.21×/1.06×
      (fwd / fwd+bwd) — the dominant cost of the flagship UNet at train
      AND sampling batches.
    - 96→48 wins only at 128³ b1 (1.23× fwd, 1.00× fwd+bwd); at 64³ b8 it
      loses 0.65× fwd+bwd.
    - 32³ grids lose (48→48 b8: 0.68× fwd — packed z′=16 tiles poorly),
      as do all ≥96-channel equal-width classes (direct conv is already
      lane-filled there, 111–160 TF/s; the 2× packed FLOPs only hurt).
    """
    if kernel != 3 or len(shape) != 4:
        return False
    b, sx, sy, sz = shape
    if sz % 2:
        return False
    if min(sx, sy, sz) < 64:
        return False
    if cin <= 48 and cout <= 48:
        return True
    return cin <= 96 and cout <= 48 and b == 1 and min(sx, sy, sz) >= 128
