"""Explicit spatial (context-parallel) primitives under ``shard_map``.

The reference never shards the voxel grid — its whole long-context strategy is
linear attention + innermost-only full attention on one device
(``/root/reference/src/flowtrain/models/unet_attn_3d.py:284-341,559-560``;
SURVEY.md §5 "long-context").  Beyond 64³ a single chip runs out of HBM, so
this module provides the volumetric analogue of sequence parallelism: the X
axis of ``[B, X, Y, Z, C]`` activations is sharded over a ``spatial`` mesh
axis, and the ops that mix information across X become explicit collectives:

* :func:`halo_exchange` — ``ppermute`` boundary slabs to/from ring neighbours
  (the 3³/7³ conv halo; SURVEY.md §2.6 "TPU build plan" row SP/CP);
* :func:`halo_conv3d` — 'SAME' conv over the sharded X axis via halo exchange;
* :func:`sharded_resize3d` — exact align-corners trilinear resize of the
  sharded axis (per-shard slice of the global interpolation matrix + 1-halo);
* :func:`ring_attention` — full softmax attention with K/V blocks rotating
  around the ring, flash-style online max/sum rescaling (no [N, N] tensor on
  any device);
* :func:`sharded_linear_attention` — the reference's softmax-q·softmax-k
  linear attention with the token-axis softmax and context reduction computed
  by ``pmax``/``psum`` collectives.

All functions are designed to run inside ``jax.shard_map`` with
``axis_name`` bound to the spatial mesh axis, and reproduce the unsharded
ops exactly (tests/test_spatial_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from flowtrain_stochastic_interpolation_tpu.models.resize import _resize_matrix


def _ring_perm(axis_name: str, shift: int):
    """Permutation sending shard i's data to shard i+shift (mod S)."""
    s = lax.psum(1, axis_name)
    return [(i, (i + shift) % s) for i in range(s)]


def halo_exchange(x: Array, axis_name: str, halo: int, axis: int = 1) -> Array:
    """Concatenate ``halo``-wide neighbour slabs onto a sharded axis.

    Returns ``x`` extended by ``halo`` entries on each side of ``axis``:
    interior shards receive their neighbours' boundary slabs via ``ppermute``;
    the global edges are zero-padded (conv 'SAME' semantics).
    """
    if halo == 0:
        return x
    s = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    take_right = lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis], axis=axis)
    take_left = lax.slice_in_dim(x, 0, halo, axis=axis)
    # shard i receives shard i-1's right slab as its left halo
    left_halo = lax.ppermute(take_right, axis_name, _ring_perm(axis_name, 1))
    right_halo = lax.ppermute(take_left, axis_name, _ring_perm(axis_name, -1))
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
    right_halo = jnp.where(idx == s - 1, jnp.zeros_like(right_halo), right_halo)
    return jnp.concatenate([left_halo, x, right_halo], axis=axis)


def halo_conv3d(
    x: Array,
    kernel: Array,
    bias: Optional[Array],
    axis_name: str,
    *,
    precision=None,
) -> Array:
    """'SAME' 3-D convolution of ``[B, X_loc, Y, Z, C]`` with X sharded.

    ``kernel``: ``[kx, ky, kz, C_in, C_out]`` (replicated).  The X dimension
    is extended by ``kx // 2`` halo slabs, then convolved VALID along X and
    SAME along Y/Z — output keeps the local X extent.
    """
    kx = kernel.shape[0]
    hx = kx // 2
    x_ext = halo_exchange(x, axis_name, hx, axis=1)
    pads = ((0, 0), (kernel.shape[1] // 2,) * 2, (kernel.shape[2] // 2,) * 2)
    out = lax.conv_general_dilated(
        x_ext, kernel, (1, 1, 1), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def _shard_resize_blocks(n_in: int, n_out: int, n_shards: int) -> np.ndarray:
    """Per-shard [out_loc, in_loc + 2] slices of the global align-corners
    interpolation matrix, padded so column t maps to global input column
    ``shard * in_loc - 1 + t`` (matching a 1-halo extended input).

    Verifies statically that a 1-element halo covers every shard's support.
    """
    assert n_in % n_shards == 0 and n_out % n_shards == 0, (
        f"resize {n_in}->{n_out} must divide over {n_shards} shards"
    )
    in_loc, out_loc = n_in // n_shards, n_out // n_shards
    w = _resize_matrix(n_in, n_out)  # [n_out, n_in]
    wp = np.zeros((n_out, n_in + 2), np.float32)
    wp[:, 1:-1] = w
    blocks = np.zeros((n_shards, out_loc, in_loc + 2), np.float32)
    for j in range(n_shards):
        rows = slice(j * out_loc, (j + 1) * out_loc)
        cols = slice(j * in_loc, j * in_loc + in_loc + 2)
        blocks[j] = wp[rows, cols]
        outside = wp[rows].copy()
        outside[:, cols] = 0.0
        assert not outside.any(), (
            f"shard {j}: resize {n_in}->{n_out} support exceeds 1-halo "
            f"(increase halo or change sharding)"
        )
    return blocks


def sharded_resize3d(x: Array, scale: float, axis_name: str,
                     n_shards: Optional[int] = None) -> Array:
    """Align-corners trilinear resize of ``[B, X_loc, Y, Z, C]``, X sharded.

    Y/Z resize locally with the exact dense-matrix contraction
    (:mod:`models.resize`); the sharded X axis uses the per-shard block of the
    global matrix against a 1-halo extended input, so results match the
    unsharded op bitwise (same matrix entries, same contraction order).
    """
    from flowtrain_stochastic_interpolation_tpu.models.resize import resize_linear_nd

    if n_shards is None:
        n_shards = lax.axis_size(axis_name)  # static int
    b, x_loc, y, z, c = x.shape
    n_in = x_loc * n_shards
    n_out = int(np.floor(n_in * scale))
    blocks = jnp.asarray(
        _shard_resize_blocks(n_in, n_out, n_shards), dtype=x.dtype
    )  # [S, out_loc, in_loc + 2]
    my_block = lax.dynamic_index_in_dim(
        blocks, lax.axis_index(axis_name), axis=0, keepdims=False
    )
    x_ext = halo_exchange(x, axis_name, 1, axis=1)  # [B, in_loc + 2, Y, Z, C]
    out = jnp.einsum("oi,biyzc->boyzc", my_block, x_ext)
    # local Y/Z axes
    y_out = int(np.floor(y * scale))
    z_out = int(np.floor(z * scale))
    return resize_linear_nd(out, (y_out, z_out), (2, 3))


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    axis_name: str,
    *,
    mem_k: Optional[Array] = None,
    mem_v: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Array:
    """Full softmax attention with the token axis sharded — K/V ring rotation.

    ``q, k, v``: ``[B, N_loc, H, D]`` local token blocks.  Every device holds
    its Q block; K/V blocks travel around the ring (``ppermute``) for S steps
    while flash-style online max/sum accumulation builds the exact softmax —
    no device ever materialises an [N, N] matrix.  Optional ``mem_k/mem_v``
    ``[B, M, H, D]`` (the reference's 4 memory KV slots,
    ``unet_attn_3d.py:354-366``) are counted exactly once (processed before
    the ring pass).

    Returns ``[B, N_loc, H, D]`` — each device's attended Q block.
    """
    s = lax.psum(1, axis_name)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale

    def attend_block(carry, kb, vb):
        m, l, o = carry
        logits = jnp.einsum("bnhd,bmhd->bhnm", qf, kb.astype(jnp.float32))
        m_new = jnp.maximum(m, logits.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhnm,bmhd->bnhd", p, vb.astype(jnp.float32)
        )
        return m_new, l, o

    b, n_loc, h, d = q.shape
    m0 = jnp.full((b, h, n_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, n_loc), jnp.float32)
    o0 = jnp.zeros((b, n_loc, h, d), jnp.float32)
    carry = (m0, l0, o0)
    if mem_k is not None:
        carry = attend_block(carry, mem_k, mem_v)

    def ring_step(i, state):
        carry, kb, vb = state
        carry = attend_block(carry, kb, vb)
        kb = lax.ppermute(kb, axis_name, _ring_perm(axis_name, 1))
        vb = lax.ppermute(vb, axis_name, _ring_perm(axis_name, 1))
        return carry, kb, vb

    (m, l, o), _, _ = lax.fori_loop(0, s, ring_step, (carry, k, v))
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def sharded_linear_attention(
    q: Array,
    k: Array,
    v: Array,
    axis_name: str,
    *,
    mem_k: Optional[Array] = None,
    mem_v: Optional[Array] = None,
) -> Array:
    """Reference linear attention with the token axis sharded.

    Semantics match ``unet_attn_3d.py:308-341`` exactly: q softmaxed over the
    feature axis (local), k softmaxed over the *global* token axis
    (``pmax``/``psum`` across shards), context ``k^T v`` reduced with one
    ``psum`` — communication is O(H·D²) regardless of token count, the ideal
    sharding for the reference's dominant 262k-token attention.

    ``q, k, v``: ``[B, N_loc, H, D]``; optional mem K/V counted once.
    Returns ``[B, N_loc, H, D]``.
    """
    d = q.shape[-1]
    qf = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * d ** -0.5

    kf = k.astype(jnp.float32)
    if mem_k is not None:
        kf = jnp.concatenate([mem_k.astype(jnp.float32), kf], axis=1)
        vv = jnp.concatenate([mem_v.astype(jnp.float32), v.astype(jnp.float32)], axis=1)
        # memory tokens must enter the global softmax exactly once: only
        # shard 0 keeps them active, other shards mask them out of max/sum
        active = lax.axis_index(axis_name) == 0
        mem_mask = jnp.concatenate([
            jnp.broadcast_to(active, (mem_k.shape[1],)),
            jnp.ones((k.shape[1],), bool),
        ])
        kf = jnp.where(mem_mask[None, :, None, None], kf, -jnp.inf)
    else:
        vv = v.astype(jnp.float32)

    # Global per-feature max, stability shift only: softmax is invariant to
    # it, so stop_gradient (as jax.nn.softmax does).  It must wrap the pmax
    # *operand*: pmax has no differentiation rule, and only all-zero tangents
    # make autodiff skip it.
    m = lax.pmax(lax.stop_gradient(kf).max(axis=1), axis_name)  # [B, H, D]
    p = jnp.exp(kf - m[:, None])
    p = jnp.where(jnp.isfinite(kf), p, 0.0)  # masked mem rows contribute 0
    denom = lax.psum(p.sum(axis=1), axis_name)  # [B, H, D]
    context = lax.psum(jnp.einsum("bnhd,bnhe->bhde", p, vv), axis_name)
    context = context / denom[..., None]
    out = jnp.einsum("bhde,bnhd->bnhe", context, qf)
    return out.astype(q.dtype)
