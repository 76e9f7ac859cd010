"""Core Flax building blocks for the flowtrain UNets (channels-last, TPU-first).

Rebuilds the block zoo of the reference UNets
(``/root/reference/src/flowtrain/models/unet_attn_3d.py:71-278``) in Flax with
``[B, X, Y, Z, C]`` (NDHWC) layout — XLA's native conv layout on TPU — instead
of torch's NCDHW.  1×1 convolutions become channel ``Dense`` layers (identical
math, better fusion), and resampling uses the exact align-corners trilinear
op from :mod:`.resize`.

Compute dtype is configurable (bfloat16 recommended on TPU); parameters are
always stored in float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from flowtrain_stochastic_interpolation_tpu.models.resize import resize2d, resize3d

Dtype = Any


def conv_nd(ndim: int, features: int, kernel: int, *, use_bias: bool = True,
            dtype: Dtype = None, name: Optional[str] = None,
            spatial_axis: Optional[str] = None):
    """N-D 'same' convolution (stride 1, odd kernel ⇒ torch padding=k//2).

    With ``spatial_axis`` set (3-D only, inside ``shard_map``), the X axis is
    assumed sharded over that mesh axis and the conv runs with explicit
    ``ppermute`` halo exchange (:mod:`parallel.spatial`); parameters are
    layout-identical to ``nn.Conv`` so weights interchange.
    """
    if spatial_axis is not None and ndim == 3 and kernel > 1:
        return SpatialConv3D(
            features=features, kernel=kernel, use_bias=use_bias,
            dtype=dtype, axis_name=spatial_axis, name=name,
        )
    if ndim == 3 and kernel > 1:
        # decides per call-shape between the phase-fat strided formulation
        # (MXU-shaped; ops/fat_conv.py) and the direct conv — same params
        return Conv3DFast(
            features=features, kernel=kernel, use_bias=use_bias,
            dtype=dtype, name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * ndim,
        padding="SAME",
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class Conv3DFast(nn.Module):
    """3-D 'SAME' conv that picks the fastest TPU formulation per shape.

    Parameter layout is identical to ``nn.Conv`` (``kernel``/``bias``), so
    checkpoints and the torch converter are unaffected.  The 7³ init conv on
    even grids runs as the numerically-equivalent phase-fat strided conv
    (:func:`ops.fat_conv.fat_conv3d` — measured 2.25× faster at the flagship
    shape; 3³ convs measured *slower* in fat form and stay direct, see
    ``use_fat_conv``); narrow 3³ convs on large grids run in the z2-packed
    lane-filling form (:func:`ops.packed_conv.packed_conv3d` — 1.26× at the
    dominant 64³/48-channel shape, measured dispatch rule in
    ``use_packed_conv``); everything else takes the direct
    ``lax.conv_general_dilated`` path.
    """

    features: int
    kernel: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from flowtrain_stochastic_interpolation_tpu.ops.fat_conv import (
            fat_conv3d,
            use_fat_conv,
        )
        from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import (
            packed_conv3d,
            use_packed_conv,
        )

        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias_c = None if bias is None else bias.astype(dtype)
        if use_fat_conv(x.shape[1:-1], self.features, k):
            return fat_conv3d(x, kernel, bias_c)
        if use_packed_conv(x.shape[:-1], x.shape[-1], self.features, k):
            return packed_conv3d(x, kernel, bias_c)
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out if bias_c is None else out + bias_c


class SpatialConv3D(nn.Module):
    """3-D 'SAME' conv over an X-sharded volume via explicit halo exchange.

    Drop-in for ``nn.Conv`` inside ``shard_map`` (same ``kernel``/``bias``
    parameter names and shapes — checkpoints interchange freely).
    """

    features: int
    kernel: int
    use_bias: bool = True
    dtype: Dtype = None
    axis_name: str = "spatial"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
            halo_conv3d,
        )

        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        dtype = self.dtype or x.dtype
        return halo_conv3d(
            x.astype(dtype), kernel.astype(dtype),
            None if bias is None else bias.astype(dtype),
            self.axis_name,
        )


class RMSNorm(nn.Module):
    """RMS normalisation over the channel axis with learnable per-channel gain.

    Matches reference ``RMSNorm`` (``unet_attn_3d.py:111-128``):
    ``normalize(x, axis=C) * g * sqrt(C)`` where normalize is L2 with torch's
    1e-12 floor.
    """

    dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        normed = x / jnp.maximum(norm, 1e-12).astype(x.dtype)
        return normed * (g * math.sqrt(self.dim)).astype(x.dtype)


class Upsample(nn.Module):
    """×2 align-corners trilinear upsample + 3³ conv (ref ``unet_attn_3d.py:71-88``)."""

    ch_out: int
    ndim: int = 3
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.spatial_axis is not None and self.ndim == 3:
            from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
                sharded_resize3d,
            )

            x = sharded_resize3d(x, 2.0, self.spatial_axis)
        else:
            x = resize3d(x, 2.0) if self.ndim == 3 else resize2d(x, 2.0)
        return conv_nd(self.ndim, self.ch_out, 3, dtype=self.dtype, name="conv",
                       spatial_axis=self.spatial_axis)(x)


class Downsample(nn.Module):
    """×0.5 align-corners trilinear downsample + 1×1 conv (ref ``:91-108``)."""

    ch_out: int
    ndim: int = 3
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.spatial_axis is not None and self.ndim == 3:
            from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
                sharded_resize3d,
            )

            x = sharded_resize3d(x, 0.5, self.spatial_axis)
        else:
            x = resize3d(x, 0.5) if self.ndim == 3 else resize2d(x, 0.5)
        return nn.Dense(self.ch_out, dtype=self.dtype, name="conv")(x)


# --------------------------------------------------------------------------
# Time embeddings (reference ``unet_attn_3d.py:132-218``)
# --------------------------------------------------------------------------
class SinusoidalPosEmb(nn.Module):
    """Fixed sin/cos embedding, interleaved, with (i+1)-indexed frequencies.

    Matches reference ``SinusoidalPosEmb`` (``:132-159``): frequencies
    ``exp(-(i+1) * log(theta)/(dim/2))`` and interleaved (sin, cos) pairs.
    """

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        emb = math.log(self.theta) / half
        freqs = jnp.exp((jnp.arange(half) + 1) * -emb)
        arg = t[:, None] * freqs[None, :]
        emb = jnp.stack([jnp.sin(arg), jnp.cos(arg)], axis=-1)
        return emb.reshape(emb.shape[0], -1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned-frequency sinusoidal embedding returning [t, sin, cos] (ref ``:162-178``).

    Output width is ``dim + 1`` (the raw time is concatenated).
    """

    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        assert self.dim % 2 == 0
        w = self.param("weights", nn.initializers.normal(1.0), (self.dim // 2,), jnp.float32)
        freqs = t[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate([t[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class RandomFourierEmbedding(nn.Module):
    """Frozen random Fourier features: ``cos(t*f + phi) * sqrt(2)``.

    Matches reference ``RandomFourierEmbedding`` (``:181-208``): f ~ N(0, bw²),
    phi ~ U(0,1) — NOTE the reference adds the phase *before* any 2π scaling,
    so phases only span a fraction of a period; reproduced exactly.  Stored in
    the ``constants`` collection (non-trainable, as ``requires_grad=False``).
    """

    num_channels: int
    bandwidth: float = 100.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        freqs = self.variable(
            "constants", "freqs",
            lambda: jax.random.normal(self.make_rng("params"), (self.num_channels,)) * self.bandwidth,
        ).value
        phases = self.variable(
            "constants", "phases",
            lambda: jax.random.uniform(self.make_rng("params"), (self.num_channels,)),
        ).value
        y = t[:, None] * freqs[None, :] + phases[None, :]
        return jnp.cos(y) * math.sqrt(2.0)


class LearnedFourierEmbedding(nn.Module):
    """Trainable Fourier features (reference ``LearnedFourierEmbedding``, ``:211-218``)."""

    num_channels: int
    bandwidth: float = 100.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        freqs = self.param(
            "freqs",
            lambda key, shape: jax.random.normal(key, shape) * self.bandwidth,
            (self.num_channels,),
        )
        phases = self.param("phases", nn.initializers.uniform(1.0), (self.num_channels,))
        y = t[:, None] * freqs[None, :] + phases[None, :]
        return jnp.cos(y) * math.sqrt(2.0)


class TimeMLP(nn.Module):
    """embed → Dense(time_dim) → GELU → Dense(time_dim) (ref ``:551-556``)."""

    time_resolution: int
    time_dim: int
    sin_pos: bool = False
    learned_emb: bool = False
    bandwidth: float = 100.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, t: Array) -> Array:
        if self.sin_pos:
            emb = SinusoidalPosEmb(self.time_resolution, name="embed")(t)
        elif self.learned_emb:
            emb = LearnedFourierEmbedding(self.time_resolution, self.bandwidth, name="embed")(t)
        else:
            emb = RandomFourierEmbedding(self.time_resolution, self.bandwidth, name="embed")(t)
        emb = emb.astype(self.dtype or emb.dtype)
        h = nn.Dense(self.time_dim, dtype=self.dtype, name="fc1")(emb)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.time_dim, dtype=self.dtype, name="fc2")(h)


# --------------------------------------------------------------------------
# Conv blocks (reference ``unet_attn_3d.py:222-278``)
# --------------------------------------------------------------------------
class Block(nn.Module):
    """conv3 → RMSNorm → FiLM(scale+1, shift) → SiLU → dropout (ref ``:222-244``)."""

    dim_out: int
    ndim: int = 3
    dropout: float = 0.0
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        scale_shift: Optional[Tuple[Array, Array]] = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        x = conv_nd(self.ndim, self.dim_out, 3, dtype=self.dtype, name="proj",
                    spatial_axis=self.spatial_axis)(x)
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ResnetBlock(nn.Module):
    """Two Blocks with a time-FiLM on the first + 1×1 residual (ref ``:247-278``)."""

    dim_out: int
    ndim: int = 3
    time_emb: bool = True
    dropout: float = 0.0
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: Array, time_emb: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        # NOTE: ``deterministic`` is positional-allowed (not keyword-only) so
        # ``nn.remat(ResnetBlock, static_argnums=...)`` can mark it static —
        # per-block rematerialisation is what bounds the 128³ backward's
        # activation liveness (UNet.remat_blocks).
        scale_shift = None
        if self.time_emb and time_emb is not None:
            h_t = nn.silu(time_emb)
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(h_t)
            h_t = h_t.reshape(h_t.shape[0], *([1] * self.ndim), h_t.shape[-1])
            scale_shift = tuple(jnp.split(h_t, 2, axis=-1))

        h = Block(self.dim_out, self.ndim, self.dropout, dtype=self.dtype, name="block1",
                  spatial_axis=self.spatial_axis)(
            x, scale_shift, deterministic=deterministic
        )
        h = Block(self.dim_out, self.ndim, 0.0, dtype=self.dtype, name="block2",
                  spatial_axis=self.spatial_axis)(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="res_conv")(x)
        return h + x
