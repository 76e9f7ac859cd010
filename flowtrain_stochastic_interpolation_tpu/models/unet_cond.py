"""Conditional 3D UNet: velocity prediction conditioned on observations ATb.

TPU-native rebuild of the reference conditional family.  The shipped/trained
variant is **v3** (``/root/reference/src/flowtrain/models/unet_attn_3d_cond_v3.py``;
imported as the conditional model at
``project/geodata-3d-conditional/model_train_sh_inference_cond.py:30``):

* ``ATb`` (same shape as x: the observed voxels of the embedded volume,
  zero elsewhere) is "opened" once by a 7³ conv (``cond_v3:778``);
* at **every** down and up stage the opened ATb is rescaled to the stage
  resolution and embedded to the stage width (:class:`EmbedATb`,
  ``cond_v3:112-140``), then fused into the feature map by a
  **time-conditioned** concat-mix residual block (:class:`MixATb`,
  ``cond_v3:142-190``);
* everything else matches the unconditional UNet.

The earlier v1 (additive inject at down stages only,
``unet_attn_3d_cond.py:729-747``) and v2 (concat-mix without time FiLM,
``unet_attn_3d_cond_v2.py:828-849``) variants are provided through the
``variant`` attribute for inventory parity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

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
    RMSNorm,
    TimeMLP,
    Upsample,
    conv_nd,
)
from flowtrain_stochastic_interpolation_tpu.models.resize import resize3d
from flowtrain_stochastic_interpolation_tpu.models.unet import _cast_tuple

Dtype = Any


class EmbedATb(nn.Module):
    """Rescale the opened ATb to a stage and embed to the stage width.

    v3 semantics (``cond_v3:112-140``): align-corners trilinear resize by
    ``scale_factor`` then conv5 → SiLU → conv5.  (v1 uses conv3s,
    ``unet_attn_3d_cond.py:111-140``.)
    """

    dim_out: int
    scale_factor: float = 1.0
    kernel: int = 5
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # The conv operands are tagged for the remat policy: under full-forward
        # rematerialisation the recompute of these k=5 convs materialises an
        # XLA lowering temp with ~2.7× tile-padding expansion (1.4 GB at 64³
        # b4 — the largest temp in the cond-b4 OOM dump, docs/roofline.md).
        # Saving the three stage-sized tensors instead (policy
        # save_only_these_names("atb_tower"), train/steps.py) keeps the
        # backward free of the tower recompute entirely.
        from jax.ad_checkpoint import checkpoint_name

        if self.scale_factor != 1.0:
            if self.spatial_axis is not None:
                from flowtrain_stochastic_interpolation_tpu.parallel.spatial import (
                    sharded_resize3d,
                )

                x = sharded_resize3d(x, self.scale_factor, self.spatial_axis)
            else:
                x = resize3d(x, self.scale_factor)
        x = checkpoint_name(x, "atb_tower")
        x = conv_nd(3, self.dim_out, self.kernel, dtype=self.dtype, name="conv1",
                    spatial_axis=self.spatial_axis)(x)
        x = checkpoint_name(nn.silu(x), "atb_tower")
        out = conv_nd(3, self.dim_out, self.kernel, dtype=self.dtype, name="conv2",
                      spatial_axis=self.spatial_axis)(x)
        return checkpoint_name(out, "atb_tower")


class MixATb(nn.Module):
    """Time-FiLM concat-mix residual fuse of ATb into the feature map.

    v3 semantics (``cond_v3:142-190``): ``cat(x, ATb)`` is FiLMed by a time
    MLP (SiLU → Dense(4·dim) → chunk into scale/shift over the 2·dim concat),
    then conv3 → RMSNorm → SiLU → conv3, plus the ``x`` residual.
    ``time_film=False, use_norm=False`` gives the v2 mix
    (``unet_attn_3d_cond_v2.py:200-229``: conv3 → SiLU → conv3 + residual).
    """

    dim: int
    time_film: bool = True
    use_norm: bool = True
    dtype: Dtype = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, atb: Array, t: Optional[Array]) -> Array:
        h = jnp.concatenate([x, atb], axis=-1)
        if self.time_film and t is not None:
            tv = nn.silu(t)
            tv = nn.Dense(self.dim * 4, dtype=self.dtype, name="time_mlp")(tv)
            tv = tv.reshape(tv.shape[0], 1, 1, 1, tv.shape[-1])
            scale, shift = jnp.split(tv, 2, axis=-1)
            h = h * (scale + 1.0) + shift
        h = conv_nd(3, self.dim, 3, dtype=self.dtype, name="conv1",
                    spatial_axis=self.spatial_axis)(h)
        if self.use_norm:
            h = RMSNorm(self.dim, dtype=self.dtype, name="norm")(h)
        h = nn.silu(h)
        h = conv_nd(3, self.dim, 3, dtype=self.dtype, name="conv2",
                    spatial_axis=self.spatial_axis)(h)
        return h + x


class UNet3DCond(nn.Module):
    """Conditional 3D attention UNet (v3 defaults; see module docstring).

    Ctor attributes mirror the reference (``cond_v3:592-608``).  ``variant``
    selects the conditioning topology: "v3" (default), "v2", or "v1".
    """

    dim: int
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
    fused_folded_attn: bool = True  # head-folded Pallas linear attention
    folded_attn_vjp: Optional[str] = None  # trace-time backward choice
    remat_blocks: bool = False  # per-block jax.checkpoint (see UNet.remat_blocks)
    variant: str = "v3"
    dtype: Dtype = None
    spatial_axis: Optional[str] = None  # X sharded over this mesh axis (shard_map)

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
        atb: Array,
        time: Array,
        x_self_cond: Optional[Array] = None,
        *,
        deterministic: bool = True,
    ) -> Array:
        assert x.shape == atb.shape, f"x {x.shape} vs ATb {atb.shape}"
        assert self.variant in ("v1", "v2", "v3")

        n_stages = len(self.dim_mults)
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        full_attn = tuple(self.full_attn) if self.full_attn else (
            (False,) * (n_stages - 1) + (True,)
        )
        heads = _cast_tuple(self.attn_heads, n_stages)
        dim_heads = _cast_tuple(self.attn_dim_head, n_stages)
        time_dim = self.dim * 4
        embed_kernel = 3 if self.variant == "v1" else 5
        mix_time_film = self.variant == "v3"

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        atb = atb.astype(compute_dtype)

        # open ATb once with a 7^3 conv at data width (cond_v3:626-628,778)
        atb_opened = conv_nd(
            3, self.data_channels, 7, dtype=self.dtype, name="init_conv_ATb",
            spatial_axis=self.spatial_axis,
        )(atb)

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        x = conv_nd(3, self.dim, 7, dtype=self.dtype, name="init_conv_x",
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
            RB = nn.remat(ResnetBlock, static_argnums=(3,))
        res = lambda dim_out, name: RB(
            dim_out, 3, dropout=self.dropout, dtype=self.dtype, name=name,
            spatial_axis=self.spatial_axis,
        )

        def fuse(x, t, dim, scale, name):
            """Stage-level conditioning injection per variant."""
            atb_scaled = EmbedATb(
                dim, scale_factor=scale, kernel=embed_kernel,
                dtype=self.dtype, name=f"{name}_embed",
                spatial_axis=self.spatial_axis,
            )(atb_opened)
            if self.variant == "v1":
                return x + atb_scaled  # additive (cond v1 forward :744-747)
            return MixATb(
                dim, time_film=mix_time_film, use_norm=self.variant == "v3",
                dtype=self.dtype, name=f"{name}_mix",
                spatial_axis=self.spatial_axis,
            )(x, atb_scaled, t)

        skips = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= (n_stages - 1)
            x = fuse(x, t, dim_in, 0.5**i, f"downs_{i}_atb")
            x = res(dim_in, f"downs_{i}_block1")(x, t, deterministic)
            skips.append(x)
            x = res(dim_in, f"downs_{i}_block2")(x, t, deterministic)
            attn = self._attn(dim_in, full_attn[i], heads[i], dim_heads[i], f"downs_{i}_attn")
            if attn is not None:
                x = attn(x) + x
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, name=f"downs_{i}_downsample",
                               spatial_axis=self.spatial_axis)(x)
            else:
                x = conv_nd(3, dim_out, 3, dtype=self.dtype, name=f"downs_{i}_downsample",
                            spatial_axis=self.spatial_axis)(x)

        mid_dim = dims[-1]
        x = res(mid_dim, "mid_block1")(x, t, deterministic)
        mid_attn = self._attn(mid_dim, True, heads[-1], dim_heads[-1], "mid_attn")
        if mid_attn is not None:
            x = mid_attn(x) + x
        x = res(mid_dim, "mid_block2")(x, t, deterministic)

        for i, ((dim_in, dim_out), fa, hh, dh) in enumerate(
            zip(in_out[::-1], full_attn[::-1], heads[::-1], dim_heads[::-1])
        ):
            is_last = i == (n_stages - 1)
            if self.variant != "v1":  # v1 conditions on the down path only
                x = fuse(x, t, dim_out, 0.5 ** (n_stages - i - 1), f"ups_{i}_atb")
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = res(dim_out, f"ups_{i}_block1")(x, t, deterministic)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = res(dim_out, f"ups_{i}_block2")(x, t, deterministic)
            attn = self._attn(dim_out, fa, hh, dh, f"ups_{i}_attn")
            if attn is not None:
                x = attn(x) + x
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"ups_{i}_upsample",
                             spatial_axis=self.spatial_axis)(x)
            else:
                x = conv_nd(3, dim_in, 3, dtype=self.dtype, name=f"ups_{i}_upsample",
                            spatial_axis=self.spatial_axis)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = res(self.dim, "final_res_block")(x, t, deterministic)
        out = nn.Dense(self.data_channels, dtype=self.dtype, name="final_conv")(x)
        return out.astype(jnp.float32)
