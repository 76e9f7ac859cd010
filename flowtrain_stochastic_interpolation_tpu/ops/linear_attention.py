"""Pallas fused linear attention (softmax-q · softmax-k factorisation).

The reference's whole strategy for 64³ volumes is O(N) linear attention at
every non-innermost UNet scale (``unet_attn_3d.py:284-341``; SURVEY.md §5
"long-context"), leaving full attention only for 4³ tokens.  At N = 262,144
tokens the op is HBM-bandwidth-bound: the naive composition materialises
``softmax(k)`` (an [N, d] tensor) and two einsum intermediates in HBM.

This kernel fuses the whole pipeline per (batch·head):

* **context pass** — online-max streaming over key blocks accumulates the
  normalised context ``C[d, e] = Σ_n softmax_N(k)[n, d] · v[n, e]`` in VMEM
  (flash-attention-style rescaling, one read of k and v);
* **projection pass** — ``out = (softmax_d(q) · scale) @ C`` per q block.

``softmax(k)`` never touches HBM.  The custom VJP computes gradients with the
closed-form linear-attention backward (all [d, e]-bottlenecked matmuls) in
plain XLA — it reads q/k/v once more but allocates nothing N×N-sized.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _context_kernel(k_ref, v_ref, ctx_ref, m_scr, s_scr, ctx_scr, *,
                    n_keys: int, block_k: int):
    """Online softmax-over-N context accumulation: C = softmax_N(k)^T v."""
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)
        ctx_scr[:] = jnp.zeros_like(ctx_scr)

    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)  # [bk, e]

    row = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    k = jnp.where(row < n_keys, k, _NEG_INF)  # pad rows contribute exp(-inf)=0
    # OOB tail reads are undefined (possibly NaN): zero v so 0-weight rows
    # cannot poison the accumulation
    v_row = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    v = jnp.where(v_row < n_keys, v, 0.0)

    m_prev = m_scr[0]  # [d]
    m_new = jnp.maximum(m_prev, jnp.max(k, axis=0))
    alpha = jnp.exp(m_prev - m_new)  # [d]
    p = jnp.exp(k - m_new[None, :])  # [bk, d]

    s_scr[0] = s_scr[0] * alpha + jnp.sum(p, axis=0)
    m_scr[0] = m_new
    # ctx[d, e] += p^T v
    ctx_scr[:] = ctx_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        ctx_ref[0] = (ctx_scr[:] / s_scr[0][:, None]).astype(ctx_ref.dtype)


def _project_kernel(q_ref, ctx_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    p = jax.nn.softmax(q, axis=-1) * scale
    ctx = ctx_ref[0].astype(jnp.float32)  # [d, e]
    o_ref[0] = jax.lax.dot_general(
        p, ctx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _linear_attn_fwd_bhnd(q: Array, k: Array, v: Array,
                          block_n: int) -> Array:
    bh, n, d = q.shape
    m = k.shape[1]
    e = v.shape[2]
    scale = d**-0.5

    # NOTE: no physical padding — ragged tails are handled by pallas' block
    # bounds (OOB reads are masked via the n_keys row test in the kernel; OOB
    # output rows are dropped).  An explicit jnp.pad here would materialise a
    # full padded copy of the 262k-token tensors in HBM (observed: 2 GB HLO
    # temps at 64³ batch 8).
    ctx = pl.pallas_call(
        functools.partial(_context_kernel, n_keys=m, block_k=block_n),
        grid=(bh, pl.cdiv(m, block_n)),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda b, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_n, e), lambda b, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, e), lambda b, ki: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, d, e), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, e), jnp.float32),
        ],
    )(k, v)

    out = pl.pallas_call(
        functools.partial(_project_kernel, scale=scale),
        grid=(bh, pl.cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, d, e), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, e), lambda b, qi: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, e), q.dtype),
    )(q, ctx)
    return out


def _reference_bhnd(q: Array, k: Array, v: Array) -> Array:
    """XLA reference on [BH, N/M, d] tensors (matches reference einsums)."""
    scale = q.shape[-1] ** -0.5
    qs = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * scale
    ks = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    ctx = jnp.einsum("bnd,bne->bde", ks, v.astype(jnp.float32))
    return jnp.einsum("bnd,bde->bne", qs, ctx).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _linear_attn_bhnd(q, k, v, block_n: int):
    return _linear_attn_fwd_bhnd(q, k, v, block_n)


def _fwd(q, k, v, block_n):
    return _linear_attn_fwd_bhnd(q, k, v, block_n), (q, k, v)


def _bwd(block_n, res, dout):
    """Closed-form backward; every intermediate is [d, e]-bottlenecked."""
    q, k, v = res
    f32 = jnp.float32
    scale = q.shape[-1] ** -0.5
    qf, kf, vf, do = (t.astype(f32) for t in (q, k, v, dout))

    p_q = jax.nn.softmax(qf, axis=-1)          # [b, n, d]
    p_k = jax.nn.softmax(kf, axis=1)           # [b, m, d]
    ctx = jnp.einsum("bmd,bme->bde", p_k, vf)  # [b, d, e]

    # out = scale * p_q @ ctx
    d_ctx = scale * jnp.einsum("bnd,bne->bde", p_q, do)
    d_pq = scale * jnp.einsum("bne,bde->bnd", do, ctx)
    dq = p_q * (d_pq - jnp.sum(d_pq * p_q, axis=-1, keepdims=True))

    dv = jnp.einsum("bmd,bde->bme", p_k, d_ctx)
    d_pk = jnp.einsum("bme,bde->bmd", vf, d_ctx)
    dk = p_k * (d_pk - jnp.sum(d_pk * p_k, axis=1, keepdims=True))

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_linear_attn_bhnd.defvjp(_fwd, _bwd)


def linear_attention(q: Array, k: Array, v: Array, *, block_n: int = 1024) -> Array:
    """Fused linear attention on ``[B, N, h, d]`` q and ``[B, M, h, d]`` k/v.

    Semantics match the reference (``unet_attn_3d.py:308-341``): q softmaxed
    over features and scaled by d^-0.5, k softmaxed over tokens, context
    ``k^T v`` applied to q.  Returns ``[B, N, h, d]``.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
    block_n = min(block_n, _round_up(max(n, m), 128))
    out = _linear_attn_bhnd(to_bhnd(q), to_bhnd(k), to_bhnd(v), block_n)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def linear_attention_reference(q: Array, k: Array, v: Array) -> Array:
    """Unfused XLA reference in the same [B, N, h, d] layout (for tests)."""
    b, n, h, d = q.shape
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
    out = _reference_bhnd(to_bhnd(q), to_bhnd(k), to_bhnd(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Head-folded kernel (v2): [B, N, h·d] layout with h·d = 128 lanes.
#
# The v1 kernel above works per (batch·head) on d = 32-wide blocks — only 32
# of the TPU's 128 lanes carry data, and feeding it requires a [B,N,h,d] →
# [B·h,N,d] transpose (two extra passes over 0.5 GB tensors at the flagship
# 64³ shape).  Folding the heads into the lane dimension fixes both:
#
# * k's softmax is over tokens **per column** — columns are independent, so a
#   folded [N, 128] layout changes nothing;
# * q's softmax over each 32-wide head group is computed with a *global* row
#   max (any per-row shift is valid for softmax) and a block-diagonal
#   ones-matmul for the per-group sums — full-lane ops only;
# * the per-head [d, d] context matmuls become one [128, 128] matmul with a
#   block-diagonal mask (4× redundant FLOPs on a [d,e]-sized op: free).
#
# The 4 memory-KV tokens (ref ``unet_attn_3d.py:306-320``) seed the online
# accumulators at grid step 0, so k/v are consumed without a concatenated
# copy.  Reference semantics: ``unet_attn_3d.py:284-341``.
# ---------------------------------------------------------------------------


def _folded_context_kernel(k_ref, v_ref, mk_ref, mv_ref, ctx_ref,
                           m_scr, s_scr, ctx_scr, *,
                           n_keys: int, block_k: int, heads: int, dim_head: int):
    """Online softmax-over-N context: ctx = blockdiag(softmax_N([mem;k])^T v)."""
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    hd = heads * dim_head

    @pl.when(ki == 0)
    def _init():
        # seed with the memory-KV contribution (exact: online max continues)
        mk = mk_ref[...].astype(jnp.float32)  # [n_mem, hd]
        mv = mv_ref[...].astype(jnp.float32)
        m0 = jnp.max(mk, axis=0)  # [hd]
        p0 = jnp.exp(mk - m0[None, :])
        m_scr[0] = m0
        s_scr[0] = jnp.sum(p0, axis=0)
        ctx_scr[:] = jax.lax.dot_general(
            p0, mv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    k = k_ref[0].astype(jnp.float32)  # [bk, hd]
    v = v_ref[0].astype(jnp.float32)
    row = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    k = jnp.where(row < n_keys, k, _NEG_INF)
    v = jnp.where(row < n_keys, v, 0.0)

    m_prev = m_scr[0]
    m_new = jnp.maximum(m_prev, jnp.max(k, axis=0))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(k - m_new[None, :])

    s_scr[0] = s_scr[0] * alpha + jnp.sum(p, axis=0)
    m_scr[0] = m_new
    ctx_scr[:] = ctx_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        ctx = ctx_scr[:] / s_scr[0][:, None]
        # zero cross-head blocks so the projection matmul is exact per-head
        gi = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
        gj = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
        ctx_ref[0] = jnp.where(gi == gj, ctx, 0.0).astype(ctx_ref.dtype)


def _group_max(q: Array, heads: int, dim_head: int) -> Array:
    """Per-head-group row max of a folded ``[rows, heads·dim_head]`` tile.

    A *global* row max is a valid softmax shift per group but underflows a
    group whose logits sit ~88+ below another head's in the same row (exp()
    → 0 in f32 ⇒ denominator 0 ⇒ NaN).  ``heads`` is static and small, so
    static lane slices + per-group max keep every group's shift tight.
    """
    parts = [
        jnp.max(q[:, h * dim_head:(h + 1) * dim_head], axis=-1, keepdims=True)
        for h in range(heads)
    ]
    return jnp.concatenate(
        [jnp.broadcast_to(p, (q.shape[0], dim_head)) for p in parts], axis=-1
    )


def _folded_project_kernel(q_ref, ctx_ref, o_ref, *,
                           heads: int, dim_head: int, scale: float):
    """out = groupsoftmax(q) · scale @ ctx  (ctx already block-diagonal)."""
    hd = heads * dim_head
    q = q_ref[0].astype(jnp.float32)  # [bq, hd]
    e = jnp.exp(q - _group_max(q, heads, dim_head))
    gi = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    gj = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    ones_bd = jnp.where(gi == gj, 1.0, 0.0).astype(jnp.float32)
    denom = jax.lax.dot_general(  # lane j <- sum of j's head group
        e, ones_bd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = (e / denom) * scale
    ctx = ctx_ref[0].astype(jnp.bfloat16)  # [hd, hd]
    o_ref[0] = jax.lax.dot_general(
        p.astype(jnp.bfloat16), ctx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _folded_fwd(q: Array, k: Array, v: Array, mem_k: Array, mem_v: Array,
                heads: int, block_n: int) -> Array:
    b, n, hd = q.shape
    m = k.shape[1]
    dim_head = hd // heads
    scale = dim_head**-0.5

    ctx = pl.pallas_call(
        functools.partial(
            _folded_context_kernel, n_keys=m, block_k=block_n,
            heads=heads, dim_head=dim_head,
        ),
        grid=(b, pl.cdiv(m, block_n)),
        in_specs=[
            pl.BlockSpec((1, block_n, hd), lambda bb, ki: (bb, ki, 0)),
            pl.BlockSpec((1, block_n, hd), lambda bb, ki: (bb, ki, 0)),
            pl.BlockSpec(mem_k.shape, lambda bb, ki: (0,) * mem_k.ndim),
            pl.BlockSpec(mem_v.shape, lambda bb, ki: (0,) * mem_v.ndim),
        ],
        out_specs=pl.BlockSpec((1, hd, hd), lambda bb, ki: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hd, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((hd, hd), jnp.float32),
        ],
    )(k, v, mem_k, mem_v)

    out = pl.pallas_call(
        functools.partial(
            _folded_project_kernel, heads=heads, dim_head=dim_head, scale=scale
        ),
        grid=(b, pl.cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec((1, block_n, hd), lambda bb, qi: (bb, qi, 0)),
            pl.BlockSpec((1, hd, hd), lambda bb, qi: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, hd), lambda bb, qi: (bb, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q.dtype),
    )(q, ctx)
    return out


def _folded_reference(q, k, v, mem_k, mem_v, heads):
    """XLA reference for the folded layout (also the VJP recompute path)."""
    b, n, hd = q.shape
    d = hd // heads
    f32 = jnp.float32
    qf = q.astype(f32).reshape(b, n, heads, d)
    kf = jnp.concatenate(
        [jnp.broadcast_to(mem_k[None], (b, *mem_k.shape)), k.astype(f32)], axis=1
    ).reshape(b, -1, heads, d)
    vf = jnp.concatenate(
        [jnp.broadcast_to(mem_v[None], (b, *mem_v.shape)), v.astype(f32)], axis=1
    ).reshape(b, -1, heads, d)
    qs = jax.nn.softmax(qf, axis=-1) * d**-0.5
    ks = jax.nn.softmax(kf, axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", ks, vf)
    out = jnp.einsum("bnhd,bhde->bnhe", qs, ctx)
    return out.reshape(b, n, hd).astype(q.dtype)


# Env default for the folded backward, read ONCE at import: the VJP body
# runs at TRACE time, so a late env flip after first compile would silently
# do nothing — a module constant makes the trace-time nature explicit.
# Prefer the per-call/config switch: ``linear_attention_folded(backward=...)``
# / ``ModelConfig.attn_folded_vjp``.
_AUTODIFF_VJP_ENV_DEFAULT = os.environ.get("FLOWTRAIN_AUTODIFF_ATTN_VJP") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _linear_attn_folded(q, k, v, mem_k, mem_v, heads: int, block_n: int,
                        bwd_mode: str):
    return _folded_fwd(q, k, v, mem_k, mem_v, heads, block_n)


def _folded_vjp_fwd(q, k, v, mem_k, mem_v, heads, block_n, bwd_mode):
    return _folded_fwd(q, k, v, mem_k, mem_v, heads, block_n), (q, k, v, mem_k, mem_v)


# Above this row count the one-shot closed form's [N, h·d] f32 intermediates
# pass the GB mark (1 GB each at 128³'s 2.1M rows — measured as the
# peak-HBM holder in the 128³ b1 train-step OOM dumps); the chunked form
# computes identical math in row blocks.
_CHUNKED_BWD_MIN_ROWS = 1 << 20


def _folded_vjp_bwd(heads, block_n, bwd_mode, res, dout):
    """Backward for the folded kernel.

    Default ("closed_form"): the closed-form VJP — the controlled A/B on the
    uncond flagship train step (same program, batch 4 × accum 2, warm caches)
    measured it 2.7× faster than autodiff-of-reference (525 vs 1425
    ms/micro-step, 2026-08-17); at ≥2^20 rows it auto-delegates to the
    chunked form (same math, chunk-bounded memory).  ``bwd_mode`` (a
    trace-time static) keeps the A/B switchable per call:
    "closed_form" | "chunked" | "autodiff".
    """
    if bwd_mode == "autodiff":
        q, k, v, mem_k, mem_v = res
        _, vjp = jax.vjp(
            lambda qq, kk, vv, mk, mv: _folded_reference(qq, kk, vv, mk, mv, heads),
            q, k, v, mem_k, mem_v,
        )
        return vjp(dout)
    if bwd_mode == "chunked" or res[0].shape[1] >= _CHUNKED_BWD_MIN_ROWS:
        # Both one-shot closed forms (f32 AND bf16) delegate above the row
        # threshold: the bf16 form halves each [N, h·d] intermediate but
        # several are live at once, and the 2^20-row bound was set by a
        # measured 128³ train-step OOM — the chunked form is the only one
        # with chunk-bounded peak memory (ADVICE r4 #1).
        return _folded_vjp_bwd_closed_form_chunked(heads, block_n, res, dout)
    if bwd_mode == "closed_form_bf16":
        return _folded_vjp_bwd_closed_form_bf16(heads, block_n, res, dout)
    return _folded_vjp_bwd_closed_form(heads, block_n, res, dout)


def _folded_vjp_bwd_closed_form(heads, block_n, res, dout):
    """Closed-form XLA backward in the folded layout.

    Every intermediate is either [N, h·d]-shaped (one pass) or
    [h·d, h·d]-bottlenecked; the memory tokens are handled as a separate
    small term — k/v are never concatenated.
    """
    q, k, v, mem_k, mem_v = res
    f32 = jnp.float32
    b, n, hd = q.shape
    d = hd // heads
    scale = d**-0.5
    qf, kf, vf, do = (t.astype(f32) for t in (q, k, v, dout))
    mkf, mvf = mem_k.astype(f32), mem_v.astype(f32)

    gi = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // d
    gj = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // d
    G = (gi == gj).astype(f32)  # block-diagonal ones (head groups)

    # ---- recompute forward pieces ----
    # q group-softmax with a per-head shift (same underflow guard as the
    # forward kernel's _group_max; a global row shift can zero a whole group)
    m_q = jnp.max(qf.reshape(b, n, heads, d), axis=-1, keepdims=True)
    e_q = jnp.exp(qf - jnp.broadcast_to(m_q, (b, n, heads, d)).reshape(b, n, hd))
    s_q = e_q / jnp.einsum("bnd,de->bne", e_q, G)  # [b, n, hd]

    # k column softmax over [mem; tokens] without concat
    M = jnp.maximum(jnp.max(kf, axis=1), jnp.max(mkf, axis=0)[None])  # [b, hd]
    ek = jnp.exp(kf - M[:, None, :])            # [b, n, hd]
    em = jnp.exp(mkf[None] - M[:, None, :])     # [b, n_mem, hd]
    Z = jnp.sum(ek, axis=1) + jnp.sum(em, axis=1)  # [b, hd]
    p_k = ek / Z[:, None, :]
    p_m = em / Z[:, None, :]

    ctx = (jnp.einsum("bnd,bne->bde", p_k, vf)
           + jnp.einsum("bnd,ne->bde", p_m, mvf)) * G[None]

    # ---- backward ----
    d_s = scale * jnp.einsum("bne,bde->bnd", do, ctx)
    dq = s_q * (d_s - jnp.einsum("bnd,de->bne", d_s * s_q, G))

    d_ctx = scale * jnp.einsum("bnd,bne->bde", s_q, do) * G[None]

    dv = jnp.einsum("bnd,bde->bne", p_k, d_ctx)
    dmv = jnp.einsum("bnd,bde->ne", p_m, d_ctx)

    d_pk = jnp.einsum("bne,bde->bnd", vf, d_ctx)       # real tokens
    d_pm = jnp.einsum("ne,bde->bnd", mvf, d_ctx)       # mem tokens
    # column-softmax VJP: shared inner product over ALL tokens per column
    inner = (jnp.sum(d_pk * p_k, axis=1) + jnp.sum(d_pm * p_m, axis=1))  # [b, hd]
    dk = p_k * (d_pk - inner[:, None, :])
    dmk = jnp.sum(p_m * (d_pm - inner[:, None, :]), axis=0)

    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmk.astype(mem_k.dtype), dmv.astype(mem_v.dtype))


def _folded_vjp_bwd_closed_form_bf16(heads, block_n, res, dout):
    """Closed-form backward with the [N, h·d] streams kept in the input dtype.

    VERDICT r3 #3(a): the f32 closed form's ``f32[4, 262144, 128]``
    intermediates cost ~25–30 ms of the b4 train micro-step (4× 3.3 ms
    elementwise fusions + ~6.5 ms of f32 layout copies — r3 xplane audit,
    docs/roofline.md).  Same math as :func:`_folded_vjp_bwd_closed_form`
    with a dtype discipline instead of a blanket f32 upcast:

    - softmax *stabilizers* (row/column max, normalizers Z, the column
      inner product) and every [b, h·d]/[b, h·d, h·d] reduction accumulate
      in f32 (``preferred_element_type`` on the MXU einsums / ``dtype=`` on
      the reduces);
    - the exponentials are *computed* in f32 inside the fused elementwise
      pass, then rounded to the stream dtype (bf16 in production) before
      any [N, h·d]-shaped materialization — halving the HBM traffic and
      copy width of every big intermediate;
    - ``1/Z`` column scales are folded into the small [b, h·d, h·d]
      context/cotangent tensors, so the k column-softmax probabilities are
      never materialized at all.

    Gradient error vs the f32 closed form is O(bf16 ulp) ≈ 0.4% relative —
    the same rounding the bf16 forward already accepts
    (tests/test_linear_attention.py pins it at 2e-2).
    """
    q, k, v, mem_k, mem_v = res
    f32 = jnp.float32
    cdt = q.dtype  # stream dtype (bf16 in production; f32 in f32 tests)
    b, n, hd = q.shape
    d = hd // heads
    scale = d**-0.5
    pf32 = dict(preferred_element_type=f32)

    # ---- q group-softmax: exp in f32 inside the fusion, stream in cdt ----
    q4 = q.reshape(b, n, heads, d)
    m_q = jnp.max(q4, axis=-1, keepdims=True)
    e4 = jnp.exp((q4 - m_q).astype(f32))
    s_q = (e4 / jnp.sum(e4, axis=-1, keepdims=True)).astype(cdt) \
        .reshape(b, n, hd)

    # ---- k column softmax pieces (normalizers f32, stream cdt) ----
    mkf = mem_k.astype(f32)
    M = jnp.maximum(jnp.max(k, axis=1).astype(f32), jnp.max(mkf, axis=0)[None])
    ekb = jnp.exp(k.astype(f32) - M[:, None, :]).astype(cdt)   # [b, n, hd]
    em = jnp.exp(mkf[None] - M[:, None, :])                    # [b, n_mem, hd] f32
    Z = jnp.sum(ekb, axis=1, dtype=f32) + jnp.sum(em, axis=1)  # [b, hd] f32
    p_m = em / Z[:, None, :]

    gi = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // d
    gj = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // d
    G = (gi == gj).astype(f32)  # block-diagonal ones (head groups)

    # ---- context & its cotangent: 1/Z folded into the small tensors ----
    ctx = (jnp.einsum("bnd,bne->bde", ekb, v, **pf32) / Z[:, :, None]
           + jnp.einsum("bnd,ne->bde", p_m, mem_v.astype(f32))) * G[None]
    d_ctx = scale * jnp.einsum("bnd,bne->bde", s_q, dout, **pf32) * G[None]
    d_ctx_over_z = d_ctx / Z[:, :, None]                      # [b, hd, hd] f32

    # ---- backward, bf16 streams / f32 accumulators ----
    d_s = scale * jnp.einsum("bne,bde->bnd", dout, ctx.astype(cdt))
    ss4 = (d_s * s_q).reshape(b, n, heads, d)
    corr = jnp.sum(ss4.astype(f32), axis=-1, keepdims=True).astype(cdt)
    dq = s_q * (d_s - jnp.broadcast_to(corr, ss4.shape).reshape(b, n, hd))

    dv = jnp.einsum("bnd,bde->bne", ekb, d_ctx_over_z.astype(cdt))
    dmv = jnp.einsum("bnd,bde->ne", p_m, d_ctx)

    d_pk = jnp.einsum("bne,bde->bnd", v, d_ctx_over_z.astype(cdt))  # = v·d_ctx/Z… see below
    d_pm = jnp.einsum("ne,bde->bnd", mem_v.astype(f32), d_ctx)
    # column-softmax VJP.  With p_k = ekb/Z and d_pk_true = v·d_ctx:
    # inner = Σ_n d_pk_true·p_k + Σ_m d_pm·p_m = Σ_n ekb·(v·d_ctx/Z) + mem
    inner = (jnp.sum((ekb * d_pk).astype(f32), axis=1)
             + jnp.sum(d_pm * p_m, axis=1))                   # [b, hd] f32
    # dk = p_k·(d_pk_true − inner) = ekb·(d_pk − inner/Z).  The subtraction
    # cancels where d_pk ≈ inner/Z, so it runs in f32 inside the elementwise
    # fusion (registers only — the operands stream in as bf16 and the result
    # stores in the output dtype; ADVICE r4 #2).
    dk = ekb.astype(f32) * (d_pk.astype(f32) - (inner / Z)[:, None, :])
    dmk = jnp.sum(p_m * (d_pm - inner[:, None, :]), axis=0)

    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmk.astype(mem_k.dtype), dmv.astype(mem_v.dtype))


def _folded_vjp_bwd_closed_form_chunked(heads, block_n, res, dout,
                                        target_rows: int = 1 << 17):
    """Closed-form backward with the [N, h·d] f32 work chunked over rows.

    Identical math to :func:`_folded_vjp_bwd_closed_form` — rows couple only
    through [b, h·d] / [b, h·d, h·d] reductions (softmax normalisers M/Z,
    context ``ctx``, its cotangent ``d_ctx``, the column inner product) — so
    the sequence is processed in ``lax.scan`` row blocks:

    * pass 1: column max M of k;
    * pass 2: accumulate Z (Σ eᵏ), U (Σ eᵏᵀ·v) and W (Σ s_qᵀ·dout);
    * pass 3: accumulate the column-softmax inner product;
    * pass 4: emit dq/dk/dv per block via in-place ``dynamic_update_slice``
      on scan-carried output buffers (donated by XLA — no stacked copies).

    Peak extra memory is a handful of [b, chunk, h·d] f32 tiles (~67 MB at
    the default chunk) instead of [b, N, h·d] f32 (1 GB each at 128³) —
    the memory form that lets the 128³ b1 train step fit on one chip; the
    cost is re-reading the bf16 q/k/v/dout streams ~3× (HBM-cheap next to
    the backward's conv traffic).
    """
    q, k, v, mem_k, mem_v = res
    b, n, hd = q.shape
    chunk = min(n, target_rows)
    while n % chunk:
        chunk //= 2  # dims are powers of two in practice; terminates at 1
    if chunk < 512 and chunk != n:
        # pathological row count — the one-shot form is fine at such sizes
        return _folded_vjp_bwd_closed_form(heads, block_n, res, dout)
    nc = n // chunk
    d = hd // heads
    scale = d**-0.5
    f32 = jnp.float32
    mkf, mvf = mem_k.astype(f32), mem_v.astype(f32)

    gi = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // d
    gj = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // d
    G = (gi == gj).astype(f32)

    starts = jnp.arange(nc) * chunk

    def _sl(x, i):
        return jax.lax.dynamic_slice_in_dim(x, i, chunk, axis=1)

    def _s_q(qc):
        m_q = jnp.max(qc.reshape(b, chunk, heads, d), axis=-1, keepdims=True)
        e_q = jnp.exp(
            qc - jnp.broadcast_to(m_q, (b, chunk, heads, d)).reshape(b, chunk, hd)
        )
        return e_q / jnp.einsum("bnd,de->bne", e_q, G)

    # ---- pass 1: column max of k (mem seeds the running max) ----
    def p1(m, i):
        kc = _sl(k, i).astype(f32)
        return jnp.maximum(m, jnp.max(kc, axis=1)), None

    M0 = jnp.broadcast_to(jnp.max(mkf, axis=0)[None], (b, hd))
    M, _ = jax.lax.scan(p1, M0, starts)

    # ---- pass 2: Z, U (unnormalised ctx), W (for d_ctx) ----
    def p2(carry, i):
        Z, U, W = carry
        kc = _sl(k, i).astype(f32)
        vc = _sl(v, i).astype(f32)
        ek = jnp.exp(kc - M[:, None, :])
        Z = Z + jnp.sum(ek, axis=1)
        U = U + jnp.einsum("bnd,bne->bde", ek, vc)
        W = W + jnp.einsum(
            "bnd,bne->bde", _s_q(_sl(q, i).astype(f32)), _sl(dout, i).astype(f32)
        )
        return (Z, U, W), None

    em = jnp.exp(mkf[None] - M[:, None, :])  # [b, n_mem, hd]
    (Z, U, W), _ = jax.lax.scan(
        p2,
        (
            jnp.sum(em, axis=1),
            jnp.einsum("bnd,ne->bde", em, mvf),
            jnp.zeros((b, hd, hd), f32),
        ),
        starts,
    )
    ctx = U / Z[:, :, None] * G[None]
    d_ctx = scale * W * G[None]
    p_m = em / Z[:, None, :]
    d_pm = jnp.einsum("ne,bde->bnd", mvf, d_ctx)

    # ---- pass 3: column-softmax inner product over all tokens ----
    def p3(inner, i):
        kc = _sl(k, i).astype(f32)
        vc = _sl(v, i).astype(f32)
        p_kc = jnp.exp(kc - M[:, None, :]) / Z[:, None, :]
        d_pkc = jnp.einsum("bne,bde->bnd", vc, d_ctx)
        return inner + jnp.sum(d_pkc * p_kc, axis=1), None

    inner, _ = jax.lax.scan(p3, jnp.sum(d_pm * p_m, axis=1), starts)

    # ---- pass 4: per-block outputs, written in place ----
    def p4(carry, i):
        dqb, dkb, dvb = carry
        qc = _sl(q, i).astype(f32)
        kc = _sl(k, i).astype(f32)
        vc = _sl(v, i).astype(f32)
        doc = _sl(dout, i).astype(f32)
        s_q = _s_q(qc)
        d_s = scale * jnp.einsum("bne,bde->bnd", doc, ctx)
        dqc = s_q * (d_s - jnp.einsum("bnd,de->bne", d_s * s_q, G))
        p_kc = jnp.exp(kc - M[:, None, :]) / Z[:, None, :]
        dvc = jnp.einsum("bnd,bde->bne", p_kc, d_ctx)
        d_pkc = jnp.einsum("bne,bde->bnd", vc, d_ctx)
        dkc = p_kc * (d_pkc - inner[:, None, :])
        dqb = jax.lax.dynamic_update_slice_in_dim(
            dqb, dqc.astype(q.dtype), i, axis=1
        )
        dkb = jax.lax.dynamic_update_slice_in_dim(
            dkb, dkc.astype(k.dtype), i, axis=1
        )
        dvb = jax.lax.dynamic_update_slice_in_dim(
            dvb, dvc.astype(v.dtype), i, axis=1
        )
        return (dqb, dkb, dvb), None

    (dq, dk, dv), _ = jax.lax.scan(
        p4,
        (
            jnp.zeros(q.shape, q.dtype),
            jnp.zeros(k.shape, k.dtype),
            jnp.zeros(v.shape, v.dtype),
        ),
        starts,
    )
    dmv = jnp.einsum("bnd,bde->ne", p_m, d_ctx)
    dmk = jnp.sum(p_m * (d_pm - inner[:, None, :]), axis=0)
    return (dq, dk, dv, dmk.astype(mem_k.dtype), dmv.astype(mem_v.dtype))


_linear_attn_folded.defvjp(_folded_vjp_fwd, _folded_vjp_bwd)


def linear_attention_folded(q: Array, k: Array, v: Array,
                            mem_k: Array, mem_v: Array, *, heads: int,
                            block_n: int = 1024,
                            backward: Optional[str] = None) -> Array:
    """Fused linear attention on head-folded ``[B, N, h·d]`` tensors.

    ``mem_k``/``mem_v`` are the ``[n_mem, h·d]`` learnable memory-KV tokens,
    folded the same way and shared across the batch.  Requires ``h·d`` to be a
    multiple of 128 (lane width) — the flagship config's 4×32 = 128 exactly.
    Semantics match ``unet_attn_3d.py:284-341``.

    ``backward``: "closed_form_bf16" (default since r5; the stream-dtype
    closed form — halves the backward's [N, h·d] HBM traffic when the
    streams are bf16, identical math on f32 inputs; measured ~0.7% faster
    on the uncond flagship micro-step, neutral on cond), "closed_form"
    (the f32-stream closed form; measured 2.7× faster than autodiff) —
    both one-shot forms auto-chunk at ≥2^20 rows, "chunked" (force the
    row-blocked closed form —
    chunk-bounded memory, the 128³-training form), or
    "autodiff"; None defers to the ``FLOWTRAIN_AUTODIFF_ATTN_VJP`` env var
    *as read at import time* (trace-time static — flipping the env after
    first compile has no effect; pass the argument or set
    ``ModelConfig.attn_folded_vjp`` instead).
    """
    b, n, hd = q.shape
    if hd % 128 != 0:
        raise ValueError(f"folded head dim {hd} must be a multiple of 128")
    if backward not in (None, "closed_form", "closed_form_bf16", "chunked",
                        "autodiff"):
        raise ValueError(f"unknown backward {backward!r}")
    if backward is None:
        # Default flipped to the stream-dtype closed form in r5: the paired
        # flagship A/B (uncond b4×2 micro-step, 20-step medians, 3 pairs)
        # measured 509/509/513 ms (f32 closed form) vs 504/506/506 ms
        # (bf16), a consistent ~0.7% win, never a loss (cond b2 neutral:
        # 473.6 vs 475.4 ms); with f32 inputs both forms compute identical
        # math, so only bf16-stream training is affected.  BASELINE.md r5.
        backward = "autodiff" if _AUTODIFF_VJP_ENV_DEFAULT else "closed_form_bf16"
    block_n = min(block_n, _round_up(n, 128))
    return _linear_attn_folded(q, k, v, mem_k, mem_v, heads, block_n, backward)
