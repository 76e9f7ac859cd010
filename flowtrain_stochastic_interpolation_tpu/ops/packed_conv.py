"""z2-packed odd-k convolution: lane-filling layout transform for narrow convs.

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

The transform generalises to any odd k (``_packed_z_taps``): the packed
z-window is always symmetric, and k=5 — the conditional ``EmbedATb``
towers (reference ``unet_attn_3d_cond_v3.py:112-140``) — packs its 5
z-taps into the same 3 packed taps, carrying only 1.2× structural FLOPs
(vs 2× for k=3).  Measured k=5 wins are the largest in the family
(up to 20× where XLA's direct k=5 conv collapses; see
:func:`use_packed_conv`).

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


def _packed_z_taps(k: int) -> Tuple[int, int]:
    """(lo, P): packed z-tap offsets lo..lo+P−1 covering an odd-k kernel.

    The output pair (2q, 2q+1) reads originals [2q−δm, 2q+1+δm] (δm = k//2),
    i.e. packed sites q+⌊−δm/2⌋ .. q+⌊(1+δm)/2⌋ — always a symmetric window,
    so SAME padding on the packed conv reproduces original SAME exactly
    (out-of-range original slots only ever meet structural-zero weights).
    k=3 and k=5 both pack into P=3 taps — so the k=5 form carries only
    2·(5·5·3)/5³ = 1.2× the FLOPs, vs 2× for k=3."""
    dm = k // 2
    lo = (0 - dm) // 2
    hi = (1 + dm) // 2
    return lo, hi - lo + 1


def _z2_selector(k: int, dtype) -> Array:
    """Constant [P, 2, 2, k] selector: sel[p, φi, φo, δ+δm] = 1 when packed
    tap p (offset lo+p) at input phase φi feeds output phase φo through
    original z-tap δ = 2(lo+p) + φi − φo ∈ [−δm, δm]."""
    dm = k // 2
    lo, ntaps = _packed_z_taps(k)
    sel = np.zeros((ntaps, 2, 2, k), np.float32)
    for p in range(ntaps):
        for phi in range(2):
            for pho in range(2):
                dz = 2 * (lo + p) + phi - pho
                if -dm <= dz <= dm:
                    sel[p, phi, pho, dz + dm] = 1.0
    return jnp.asarray(sel, dtype)


def pack_weights_z2(w: Array) -> Array:
    """[k, k, k, Ci, Co] → [k, k, P, 2Ci, 2Co] dense z2-packed weights.

    ``W2[dx, dy, p, φi·Ci+ci, φo·Co+co] = W[dx, dy, 2(lo+p)+φi−φo+δm, ci, co]``
    where in range, else 0.  Differentiable (a fixed 0/1 contraction), so the
    packed conv's weight gradient maps back to the original layout for free.
    """
    k, ci, co = w.shape[2], w.shape[3], w.shape[4]
    sel = _z2_selector(k, w.dtype)
    w2 = jnp.einsum("pfgd,xydio->xypfigo", sel, w)
    return w2.reshape(w.shape[0], w.shape[1], sel.shape[0], 2 * ci, 2 * co)


def packed_conv3d(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """Odd-k stride-1 SAME conv in the z2-packed layout.

    ``x``: [B, X, Y, Z, C] (Z even), ``w``: [k, k, k, C_in, C_out] in the
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

    - k=3 48→48 on ≥64³ grids wins at every measured batch: b1 128³
      1.32×/1.31×, b1 64³ 1.10×/1.21×, b2 64³ 1.46×/1.43×, b4 64³
      1.29×/1.25×, b8 64³ 1.26×/1.12×, b16 64³ 1.21×/1.06×
      (fwd / fwd+bwd) — the dominant cost of the flagship UNet at train
      AND sampling batches.
    - k=3 96→48 wins only at 128³ b1 (1.23× fwd, 1.00× fwd+bwd); at 64³ b8
      it loses 0.65× fwd+bwd.
    - k=5 ≤48-channel classes (the conditional EmbedATb towers, which pack
      into 3 z-taps at only 1.2× structural FLOPs) win at every measured
      64³ batch: 15→48 b2 1.41×/1.71×, b4 1.05×/1.40×, b8 **20.3×/8.4×**
      (XLA's direct k=5 cin=15 b8 conv collapses to 2.1 TF/s — 177 ms vs
      8.7 ms packed), b1 1.72×/1.76×; 48→48 b1 1.80×/1.73×, b2 2.27×/1.86×,
      b4 1.91×/1.71×, b8 1.83×/1.72×.  End-to-end: conditional b2 train
      step 535 → 479 ms (1.12×, ``tools/ab_packed_k5.py``).
    - 32³ grids lose (k=3 48→48 b8: 0.68× fwd; k=5 48→48 b2: 0.81×
      fwd+bwd — packed z′=16 tiles poorly), as do all ≥96-channel
      equal-width classes (direct conv is already lane-filled there,
      111–160 TF/s; the packed structural-zero FLOPs only hurt).
    """
    if len(shape) != 4:
        return False
    b, sx, sy, sz = shape
    if sz % 2:
        return False
    if min(sx, sy, sz) < 64:
        return False
    if kernel == 3:
        if cin <= 48 and cout <= 48:
            return True
        return cin <= 96 and cout <= 48 and b == 1 and min(sx, sy, sz) >= 128
    if kernel == 5:
        return cin <= 48 and cout <= 48
    return False
