"""Attention UNets predicting the stochastic-interpolation velocity field.

TPU-native rebuild of the reference UNet family:

* :class:`UNet3D` — unconditional 3D attention UNet
  (``/root/reference/src/flowtrain/models/unet_attn_3d.py:469-719``):
  7³ init conv, per-stage [res, res, attn, resample] downs, full-attn
  bottleneck, mirrored ups with two skip concats per stage, final
  concat-with-init-residual res block + 1×1 out conv.
* :class:`UNet2D` — the 2D twin for toy experiments
  (``/root/reference/src/flowtrain/models/unet_2d.py:426-635``): nearest ×2
  upsample and space-to-depth downsample, otherwise the same block zoo.

Layout is channels-last ``[B, *spatial, C]``; time is a ``[B]`` vector.
Bottleneck attention runs over flattened voxel tokens exactly as the
reference (tokens in x-major order).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from flowtrain_stochastic_interpolation_tpu.models.attention import (
    Attention,
    LinearAttention,
)
from flowtrain_stochastic_interpolation_tpu.models.layers import (
    Downsample,
    ResnetBlock,
    TimeMLP,
    Upsample,
    conv_nd,
)

Dtype = Any


def _cast_tuple(v, length: int) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == length
        return tuple(v)
    return (v,) * length


class Upsample2D(nn.Module):
    """Nearest ×2 + 3×3 conv (reference ``unet_2d.py:49-61``)."""

    ch_out: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv_nd(2, self.ch_out, 3, dtype=self.dtype, name="conv")(x)


class Downsample2D(nn.Module):
    """Space-to-depth (2×2 patch) + 1×1 conv (reference ``unet_2d.py:64-76``)."""

    ch_out: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        # 'b (h p1) (w p2) c -> b h w (c p1 p2)' — channel order (c, p1, p2)
        # matches the reference's '(c p1 p2)' for weight-parity.
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c * 4)
        return nn.Dense(self.ch_out, dtype=self.dtype, name="conv")(x)


class UNet(nn.Module):
    """Generic N-D attention UNet (see module docstring for reference map).

    Attributes mirror the reference ctor (``unet_attn_3d.py:509-525``) so
    configs translate 1:1.
    """

    dim: int
    ndim: int = 3
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    data_channels: int = 3
    dropout: float = 0.0
    self_condition: bool = False
    time_resolution: int = 64
    time_sin_pos: bool = False
    time_bandwidth: float = 100.0
    time_learned_emb: bool = False
    attn_enabled: bool = True
    attn_dim_head: Union[int, Sequence[int]] = 64
    attn_heads: Union[int, Sequence[int]] = 4
    full_attn: Optional[Sequence[bool]] = None
    flash_attn: bool = True
    # rematerialise each ResnetBlock/attention in the backward (per-block
    # jax.checkpoint).  Unlike a single whole-forward checkpoint — whose
    # transpose recomputes the entire forward and keeps every recomputed
    # activation live until its backward use — per-block scope bounds the
    # peak to one block's internals + the saved block boundaries: the
    # structural fix that fits the 128³ b1 train step on one 16 GB chip.
    remat_blocks: bool = False
    fused_folded_attn: bool = True  # head-folded Pallas linear attention
    folded_attn_vjp: Optional[str] = None  # trace-time backward choice
    dtype: Dtype = None
    # Mesh axis name for explicit spatial (context) parallelism: when set the
    # model must run inside shard_map with the X axis sharded over this mesh
    # axis — convs use ppermute halo exchange, full attention runs as ring
    # attention, linear attention's token softmax becomes pmax/psum
    # collectives (parallel/spatial.py; SURVEY.md §5 long-context plan).
    spatial_axis: Optional[str] = None

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    def _attn(self, dim: int, full: bool, heads: int, dim_head: int, name: str):
        if not self.attn_enabled:
            return None
        klass = Attention if full else LinearAttention
        if self.remat_blocks:
            klass = nn.remat(klass)
        kwargs = dict(dim=dim, heads=heads, dim_head=dim_head, dtype=self.dtype,
                      name=name, spatial_axis=self.spatial_axis)
        if full:
            kwargs["flash"] = self.flash_attn
        else:
            kwargs["fused_folded"] = self.fused_folded_attn
            kwargs["folded_vjp"] = self.folded_attn_vjp
        return klass(**kwargs)

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Array,
        x_self_cond: Optional[Array] = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        for d in x.shape[1 : 1 + self.ndim]:
            assert d % self.downsample_factor == 0, (
                f"spatial dims {x.shape[1:1 + self.ndim]} must be divisible by "
                f"{self.downsample_factor}"
            )

        n_stages = len(self.dim_mults)
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        full_attn = tuple(self.full_attn) if self.full_attn else (
            (False,) * (n_stages - 1) + (True,)
        )
        heads = _cast_tuple(self.attn_heads, n_stages)
        dim_heads = _cast_tuple(self.attn_dim_head, n_stages)
        time_dim = self.dim * 4

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        x = conv_nd(self.ndim, self.dim, 7, dtype=self.dtype, name="init_conv",
                    spatial_axis=self.spatial_axis)(x)
        r = x

        t = TimeMLP(
            self.time_resolution,
            time_dim,
            sin_pos=self.time_sin_pos,
            learned_emb=self.time_learned_emb,
            bandwidth=self.time_bandwidth,
            dtype=self.dtype,
            name="time_mlp",
        )(time.astype(compute_dtype))

        RB = ResnetBlock
        if self.remat_blocks:
            # deterministic (argnum 3: module instance is 0) is a Python
            # bool that flax Dropout branches on — it must be static
            RB = nn.remat(ResnetBlock, static_argnums=(3,))
        res = lambda dim_out, name: RB(
            dim_out, self.ndim, dropout=self.dropout, dtype=self.dtype, name=name,
            spatial_axis=self.spatial_axis,
        )
        Up = Upsample if self.ndim == 3 else Upsample2D
        Down = Downsample if self.ndim == 3 else Downsample2D
        # spatial parallelism is 3-D only; the 2-D modules take no axis kwarg
        resample_kwargs = (
            {"spatial_axis": self.spatial_axis} if self.ndim == 3 else {}
        )

        skips = []
        # ---- down path (ref forward :689-698) ----
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= (n_stages - 1)
            x = res(dim_in, f"downs_{i}_block1")(x, t, deterministic)
            skips.append(x)
            x = res(dim_in, f"downs_{i}_block2")(x, t, deterministic)
            attn = self._attn(dim_in, full_attn[i], heads[i], dim_heads[i], f"downs_{i}_attn")
            if attn is not None:
                x = attn(x) + x
            skips.append(x)
            if not is_last:
                x = Down(dim_out, name=f"downs_{i}_downsample", dtype=self.dtype,
                         **resample_kwargs)(x)
            else:
                x = conv_nd(self.ndim, dim_out, 3, dtype=self.dtype,
                            name=f"downs_{i}_downsample",
                            spatial_axis=self.spatial_axis)(x)

        # ---- bottleneck (ref :700-703) ----
        mid_dim = dims[-1]
        x = res(mid_dim, "mid_block1")(x, t, deterministic)
        mid_attn = self._attn(mid_dim, True, heads[-1], dim_heads[-1], "mid_attn")
        if mid_attn is not None:
            x = mid_attn(x) + x
        x = res(mid_dim, "mid_block2")(x, t, deterministic)

        # ---- up path (ref :705-714) ----
        for i, ((dim_in, dim_out), fa, hh, dh) in enumerate(
            zip(in_out[::-1], full_attn[::-1], heads[::-1], dim_heads[::-1])
        ):
            is_last = i == (n_stages - 1)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = res(dim_out, f"ups_{i}_block1")(x, t, deterministic)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = res(dim_out, f"ups_{i}_block2")(x, t, deterministic)
            attn = self._attn(dim_out, fa, hh, dh, f"ups_{i}_attn")
            if attn is not None:
                x = attn(x) + x
            if not is_last:
                x = Up(dim_in, name=f"ups_{i}_upsample", dtype=self.dtype,
                       **resample_kwargs)(x)
            else:
                x = conv_nd(self.ndim, dim_in, 3, dtype=self.dtype,
                            name=f"ups_{i}_upsample",
                            spatial_axis=self.spatial_axis)(x)

        # ---- head (ref :716-719) ----
        x = jnp.concatenate([x, r], axis=-1)
        x = res(self.dim, "final_res_block")(x, t, deterministic)
        out = nn.Dense(self.data_channels, dtype=self.dtype, name="final_conv")(x)
        return out.astype(jnp.float32)


class UNet3D(UNet):
    ndim: int = 3


class UNet2D(UNet):
    ndim: int = 2
