"""Attention blocks over flattened voxel/pixel tokens.

Rebuilds the reference attention zoo
(``/root/reference/src/flowtrain/models/unet_attn_3d.py:284-465``):

* :class:`LinearAttention` — O(N) softmax-q/softmax-k factorised attention
  with 4 memory KV slots, used at every non-innermost UNet scale (the
  reference's whole strategy for 262k-token volumes, SURVEY.md §5).
* :class:`Attention` — full softmax attention with memory KV, used at the
  innermost scale.  Dispatches to a Pallas flash-attention kernel when the
  token count is large enough to benefit (``ops/flash_attention.py``),
  replacing the reference's ``F.scaled_dot_product_attention`` backend
  selection (``unet_attn_3d.py:376-434``).

Both operate on channels-last feature maps ``[B, *spatial, C]``; QKV
projections are channel Dense layers (the channels-last equivalent of the
reference's 1×1 convs).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from flowtrain_stochastic_interpolation_tpu.models.layers import RMSNorm

Dtype = Any

# Minimum token count for which the Pallas kernel beats the fused einsum path
# (innermost 4^3=64 tokens never qualify; 16^3+ does).
_FLASH_MIN_TOKENS = 1024
# Pallas fused linear attention thresholds.  The v1 per-(batch·head) kernel
# measured slower than XLA at d=32 (lane underfill + bhnd transposes: RK4
# 1560 ms vs 1305 ms at the flagship shape) and stays opt-in.  The v2
# *head-folded* kernel keeps qkv in [B, N, h·d] layout (h·d = 128 = full lane
# width, no transposes) and wins on TPU v5e — it is the default whenever the
# folded width is a lane multiple (see `fused_folded`).
_FUSED_LINEAR_MIN_TOKENS = 32768
_FOLDED_LINEAR_MIN_TOKENS = 4096


class LinearAttention(nn.Module):
    """O(N) linear attention (ref ``unet_attn_3d.py:284-341``).

    q is softmaxed over the per-head feature axis, k over the token axis;
    the context ``k^T v`` is a [d, e] matrix per head, so cost is O(N d e)
    instead of O(N² d).  4 learnable memory KV tokens are prepended.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    fused: bool = False  # v1 per-head Pallas kernel: measured slower, opt-in
    fused_folded: bool = True  # v2 head-folded Pallas kernel: measured faster
    folded_vjp: Optional[str] = None  # "closed_form" | "autodiff" | None=env default
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spatial = x.shape[1:-1]
        b = x.shape[0]
        n = 1
        for s in spatial:
            n *= s
        hidden = self.heads * self.dim_head

        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)

        if (
            self.fused_folded
            and self.spatial_axis is None
            and n >= _FOLDED_LINEAR_MIN_TOKENS
            and hidden % 128 == 0
            and jax.default_backend() == "tpu"
        ):
            # head-folded Pallas path: qkv never leaves [B, N, h·d] layout
            from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
                linear_attention_folded,
            )

            qkv = qkv.reshape(b, n, 3 * hidden)
            qf, kf, vf = (
                qkv[..., :hidden],
                qkv[..., hidden : 2 * hidden],
                qkv[..., 2 * hidden :],
            )
            mem_kv = self.param(
                "mem_kv", nn.initializers.normal(1.0),
                (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32,
            ).astype(qf.dtype)
            # [h, n_mem, d] -> [n_mem, h·d] folded layout
            fold_mem = lambda t: t.transpose(1, 0, 2).reshape(self.num_mem_kv, hidden)
            out = linear_attention_folded(
                qf, kf, vf, fold_mem(mem_kv[0]), fold_mem(mem_kv[1]),
                heads=self.heads, backward=self.folded_vjp,
            )
            out = out.reshape(b, *spatial, hidden)
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            return RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)

        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, d]

        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32,
        ).astype(q.dtype)
        mk = jnp.broadcast_to(mem_kv[0], (b, *mem_kv[0].shape)).transpose(0, 2, 1, 3)
        mv = jnp.broadcast_to(mem_kv[1], (b, *mem_kv[1].shape)).transpose(0, 2, 1, 3)

        if self.spatial_axis is not None:
            # token axis sharded over the mesh: global-softmax collectives
            # (parallel.spatial) instead of local einsums
            from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
                sharded_linear_attention,
            )

            out = sharded_linear_attention(
                q, k, v, self.spatial_axis, mem_k=mk, mem_v=mv
            )
            out = out.reshape(b, *spatial, hidden)
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            return RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)

        k = jnp.concatenate([mk, k], axis=1)  # [B, N+m, h, d]
        v = jnp.concatenate([mv, v], axis=1)

        if self.fused and n >= _FUSED_LINEAR_MIN_TOKENS and self.dim_head % 8 == 0:
            # Pallas fused path: softmax(k) never materialises in HBM
            from flowtrain_stochastic_interpolation_tpu.ops.linear_attention import (
                linear_attention,
            )

            out = linear_attention(q, k, v)
        else:
            # softmax over feature axis for q, token axis for k (ref :326-327)
            q = nn.softmax(q, axis=-1) * (self.dim_head**-0.5)
            k = nn.softmax(k, axis=1)

            # context[b,h,d,e] = sum_n k[b,n,h,d] v[b,n,h,e]  (MXU contraction)
            context = jnp.einsum("bnhd,bnhe->bhde", k, v)
            out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, *spatial, hidden)

        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


def _sdpa(q: Array, k: Array, v: Array, use_flash: bool) -> Array:
    """Scaled dot-product attention on [B, N, h, d] tensors."""
    n = q.shape[1]
    if use_flash and n >= _FLASH_MIN_TOKENS and q.shape[-1] % 8 == 0:
        from flowtrain_stochastic_interpolation_tpu.ops.flash_attention import (
            flash_attention,
        )

        return flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", probs, v)


class Attention(nn.Module):
    """Full softmax attention with memory KV (ref ``unet_attn_3d.py:344-373``)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    flash: bool = True
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spatial = x.shape[1:-1]
        b = x.shape[0]
        n = 1
        for s in spatial:
            n *= s
        hidden = self.heads * self.dim_head

        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32,
        ).astype(q.dtype)
        mk = jnp.broadcast_to(mem_kv[0], (b, *mem_kv[0].shape)).transpose(0, 2, 1, 3)
        mv = jnp.broadcast_to(mem_kv[1], (b, *mem_kv[1].shape)).transpose(0, 2, 1, 3)

        if self.spatial_axis is not None:
            # token axis sharded: exact softmax via K/V ring rotation
            from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
                ring_attention,
            )

            out = ring_attention(q, k, v, self.spatial_axis, mem_k=mk, mem_v=mv)
        else:
            k = jnp.concatenate([mk, k], axis=1)
            v = jnp.concatenate([mv, v], axis=1)
            out = _sdpa(q, k, v, self.flash)
        out = out.reshape(b, *spatial, hidden)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
