"""Pallas TPU flash attention for voxel-token self-attention.

Replaces the reference's ``F.scaled_dot_product_attention`` + CUDA backend
selection (``/root/reference/src/flowtrain/models/unet_attn_3d.py:376-434``)
with an online-softmax (flash) kernel: the [N, M] score matrix is never
materialised in HBM — q blocks stream against k/v blocks in VMEM with a
running (max, sum, accumulator) triple.  Non-causal, full self-attention over
flattened ``(x y z)`` voxel tokens (+memory KV), the shape used by every
full-attention UNet stage.

The public entry :func:`flash_attention` is differentiable: the forward pass
is the Pallas kernel (also emitting the log-sum-exp), the backward pass is a
standard FA-style recomputation evaluated blockwise under ``lax.scan``
(O(block·M) memory).  Callers gate on token count — below ~1k tokens the
fused XLA einsum path is faster (see ``models/attention.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
               scale: float, n_keys: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # [bq, D]
    k = k_ref[0].astype(jnp.float32)  # [bk, D]
    v = v_ref[0].astype(jnp.float32)

    # OOB tail reads are undefined (possibly NaN): sanitise k/v rows so the
    # masked-out columns cannot poison the accumulation
    krow = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    k = jnp.where(krow < n_keys, k, 0.0)
    v = jnp.where(krow < n_keys, v, 0.0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    # mask key padding beyond the true key count
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_keys, s, _NEG_INF)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])  # [bq, bk]

    l_scr[:, 0] = alpha * l_scr[:, 0] + jnp.sum(p, axis=-1)
    m_scr[:, 0] = m_new
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, 0]
        o_ref[0] = (acc_scr[:] / l[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:, 0] + jnp.log(l)).astype(lse_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_fwd_bhnd(q: Array, k: Array, v: Array,
                    block_q: int, block_k: int) -> Tuple[Array, Array]:
    """Flash forward on [BH, N, D] tensors; returns (out, lse)."""
    bh, n, d = q.shape
    m = k.shape[1]
    scale = d**-0.5

    # no physical padding: ragged tails are masked in-kernel (see the
    # linear-attention kernel for the HBM-copy rationale)
    grid = (bh, pl.cdiv(n, block_q), pl.cdiv(m, block_k))
    kernel = functools.partial(
        _fa_kernel, scale=scale, n_keys=m, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            # lse rides as [bh, 1, n]: a (1, block_q) block on a 2-D [bh, n]
            # array is an illegal TPU tiling (sublane block 1 is neither
            # divisible by 8 nor equal to bh — rejected by Mosaic the first
            # time the kernel compiled for a real chip, fa16 A/B r5); with
            # the unit middle axis the block's last-two dims (1, block_q)
            # match (1, n) legally.
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q, k, v)
    return out, lse[:, 0, :]


def _bwd_blockwise(q, k, v, out, lse, dout, block_q: int):
    """FA backward via blockwise recomputation (scan over q blocks)."""
    bh, n, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, block_q)
    pad = n_pad - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
        dout = jnp.pad(dout, ((0, 0), (0, pad), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pad)), constant_values=1.0)

    nb = n_pad // block_q
    qb = q.reshape(bh, nb, block_q, d)
    ob = out.reshape(bh, nb, block_q, d)
    dob = dout.reshape(bh, nb, block_q, d)
    lseb = lse.reshape(bh, nb, block_q)

    f32 = jnp.float32

    def one_block(carry, blk):
        dk_acc, dv_acc = carry
        q_i, o_i, do_i, lse_i = blk
        # bf16 operands, f32 accumulation (MXU-native): the recomputed
        # scores must be f32 to match the forward kernel's precision —
        # exp() of bf16 scores would degrade p beyond bf16 rounding
        s = jnp.einsum("bqd,bkd->bqk", q_i, k,
                       preferred_element_type=f32) * scale
        p = jnp.exp(s - lse_i[..., None].astype(f32))  # [bh, bq, M] f32
        dv_acc = dv_acc + jnp.einsum("bqk,bqd->bkd", p, do_i,
                                     preferred_element_type=f32)
        dp = jnp.einsum("bqd,bkd->bqk", do_i, v, preferred_element_type=f32)
        delta = jnp.sum(do_i.astype(f32) * o_i.astype(f32), axis=-1,
                        keepdims=True)
        ds = p * (dp - delta) * scale
        dq_i = jnp.einsum("bqk,bkd->bqd", ds, k, preferred_element_type=f32)
        dk_acc = dk_acc + jnp.einsum("bqk,bqd->bkd", ds, q_i,
                                     preferred_element_type=f32)
        return (dk_acc, dv_acc), dq_i

    # f32 carry: with bf16 streams the block math promotes to f32 through
    # the f32 lse, so the accumulators must be f32 (scan requires carry
    # dtype stability — bf16 init was a latent type error, caught the first
    # time the backward traced with bf16 inputs, r5 TPU probe); f32 is also
    # the right accumulation dtype across n/block_q partial sums.
    init = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    (dk, dv), dq_blocks = jax.lax.scan(
        one_block, init,
        (qb.transpose(1, 0, 2, 3), ob.transpose(1, 0, 2, 3),
         dob.transpose(1, 0, 2, 3), lseb.transpose(1, 0, 2)),
    )
    dq = dq_blocks.transpose(1, 0, 2, 3).reshape(bh, n_pad, d)[:, :n]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bhnd(q, k, v, block_q: int, block_k: int):
    out, _ = _flash_fwd_bhnd(q, k, v, block_q, block_k)
    return out


def _flash_bhnd_fwd(q, k, v, block_q, block_k):
    out, lse = _flash_fwd_bhnd(q, k, v, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_bhnd_bwd(block_q, block_k, res, dout):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd_blockwise(q, k, v, out, lse, dout, block_q)
    return dq, dk, dv


_flash_bhnd.defvjp(_flash_bhnd_fwd, _flash_bhnd_bwd)


def flash_attention(
    q: Array, k: Array, v: Array, *, block_q: int = 256, block_k: int = 512
) -> Array:
    """Flash attention on ``[B, N, h, d]`` q and ``[B, M, h, d]`` k/v.

    Returns ``[B, N, h, d]``; softmax scale is ``d**-0.5`` (matching the
    reference ``Attend`` default, ``unet_attn_3d.py:450``).
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    out = _flash_bhnd(to_bhnd(q), to_bhnd(k), to_bhnd(v), block_q, block_k)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def attention_reference(q: Array, k: Array, v: Array) -> Array:
    """Einsum reference for testing (same layout as :func:`flash_attention`)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", p, v)
