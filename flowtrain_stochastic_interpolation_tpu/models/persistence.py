"""Model persistence + torch-checkpoint conversion.

Covers two jobs of the reference stack:

* plain save/load of parameter pytrees (reference
  ``src/flowtrain/models/persistence.py:6-49``) — here msgpack via
  ``flax.serialization`` (orbax handles full training state in
  ``train/checkpoint.py``);
* conversion of the reference's released PyTorch-Lightning ``.ckpt`` files
  (``readme.md:27-33``) into this framework's channels-last Flax pytrees:
  NCDHW→NDHWC kernel transposition, 1×1-conv→Dense squeezing, and
  per-module name mapping for the UNet3D / UNet3DCond(v3) architectures
  (SURVEY.md §7 "hard parts": checkpoint conversion).

Conversion requires ``torch`` only to deserialise; everything downstream is
numpy/JAX.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
from flax import serialization, traverse_util


# --------------------------------------------------------------------------
# Plain pytree persistence
# --------------------------------------------------------------------------
def save_model(variables: Dict[str, Any], path: str) -> None:
    """Serialise a variables pytree (params/constants/...) to msgpack."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_model(template: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load a variables pytree saved by :func:`save_model` into ``template``'s
    structure (shape/dtype validated by flax)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# --------------------------------------------------------------------------
# Torch checkpoint conversion
# --------------------------------------------------------------------------
def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _conv(w) -> np.ndarray:
    """torch conv kernel [out,in,k...] -> flax [k...,in,out]."""
    w = _np(w)
    nd = w.ndim - 2
    return np.transpose(w, (*range(2, 2 + nd), 1, 0))


def _dense_from_conv1(w) -> np.ndarray:
    """torch 1x1 conv [out,in,1..] -> flax Dense kernel [in,out]."""
    w = _np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def _dense(w) -> np.ndarray:
    """torch Linear [out,in] -> flax Dense [in,out]."""
    return _np(w).T


def _rmsnorm_g(w) -> np.ndarray:
    return _np(w).reshape(-1)


class _Mapper:
    """Accumulates flat {dst_path: array} from a torch state dict."""

    def __init__(self, sd: Dict[str, Any], src_prefix: str = ""):
        self.sd = sd
        self.src_prefix = src_prefix
        self.out: Dict[Tuple[str, ...], np.ndarray] = {}
        # non-trainable buffers (e.g. frozen RandomFourier freqs/phases) land
        # in flax's ``constants`` collection, not ``params``
        self.constants: Dict[Tuple[str, ...], np.ndarray] = {}
        self.used = set()

    def _get(self, key: str):
        full = self.src_prefix + key
        self.used.add(full)
        return self.sd[full]

    def has(self, key: str) -> bool:
        return (self.src_prefix + key) in self.sd

    def put(self, dst: str, value: np.ndarray) -> None:
        self.out[tuple(dst.split("/"))] = value

    def put_const(self, dst: str, value: np.ndarray) -> None:
        self.constants[tuple(dst.split("/"))] = value

    # --- module-level mappers -------------------------------------------
    def conv(self, src: str, dst: str, *, dense: bool = False) -> None:
        w = self._get(f"{src}.weight")
        self.put(f"{dst}/kernel", _dense_from_conv1(w) if dense else _conv(w))
        if self.has(f"{src}.bias"):
            self.put(f"{dst}/bias", _np(self._get(f"{src}.bias")))

    def linear(self, src: str, dst: str) -> None:
        self.put(f"{dst}/kernel", _dense(self._get(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self.put(f"{dst}/bias", _np(self._get(f"{src}.bias")))

    def rmsnorm(self, src: str, dst: str) -> None:
        self.put(f"{dst}/g", _rmsnorm_g(self._get(f"{src}.g")))

    def resnet(self, src: str, dst: str) -> None:
        """ResnetBlock (ref unet_attn_3d.py:247-278; the conditional variants
        name the time MLP ``time_mlp``, cond_v3:335-341)."""
        if self.has(f"{src}.mlp.1.weight"):
            self.linear(f"{src}.mlp.1", f"{dst}/mlp")
        elif self.has(f"{src}.time_mlp.1.weight"):
            self.linear(f"{src}.time_mlp.1", f"{dst}/mlp")
        self.conv(f"{src}.block1.proj", f"{dst}/block1/proj")
        self.rmsnorm(f"{src}.block1.norm", f"{dst}/block1/norm")
        self.conv(f"{src}.block2.proj", f"{dst}/block2/proj")
        self.rmsnorm(f"{src}.block2.norm", f"{dst}/block2/norm")
        if self.has(f"{src}.res_conv.weight"):
            self.conv(f"{src}.res_conv", f"{dst}/res_conv", dense=True)

    def linear_attn(self, src: str, dst: str) -> None:
        """LinearAttention (ref :284-341); mem_kv [2,h,d,n] -> [2,h,n,d]."""
        self.rmsnorm(f"{src}.norm", f"{dst}/norm")
        self.put(f"{dst}/mem_kv", np.transpose(_np(self._get(f"{src}.mem_kv")), (0, 1, 3, 2)))
        self.conv(f"{src}.to_qkv", f"{dst}/to_qkv", dense=True)
        self.conv(f"{src}.to_out.0", f"{dst}/to_out", dense=True)
        self.rmsnorm(f"{src}.to_out.1", f"{dst}/out_norm")

    def full_attn(self, src: str, dst: str) -> None:
        """Attention (ref :344-373); mem_kv layout already [2,h,n,d]."""
        self.rmsnorm(f"{src}.norm", f"{dst}/norm")
        self.put(f"{dst}/mem_kv", _np(self._get(f"{src}.mem_kv")))
        self.conv(f"{src}.to_qkv", f"{dst}/to_qkv", dense=True)
        self.conv(f"{src}.to_out", f"{dst}/to_out", dense=True)

    def attn(self, src: str, dst: str, full: bool) -> None:
        (self.full_attn if full else self.linear_attn)(src, dst)

    def embed_atb(self, src: str, dst: str) -> None:
        """EmbedATb (cond_v3:112-140)."""
        self.conv(f"{src}.conv1", f"{dst}/conv1")
        self.conv(f"{src}.conv2", f"{dst}/conv2")

    def mix_atb(self, src: str, dst: str) -> None:
        """MixATb (cond_v3:142-190)."""
        if self.has(f"{src}.time_mlp.1.weight"):
            self.linear(f"{src}.time_mlp.1", f"{dst}/time_mlp")
        self.conv(f"{src}.conv1", f"{dst}/conv1")
        self.rmsnorm(f"{src}.norm", f"{dst}/norm")
        self.conv(f"{src}.conv2", f"{dst}/conv2")

    def time_mlp(self, src: str, dst: str, *, sin_pos: bool, learned: bool) -> None:
        """time_mlp Sequential(embed, Linear, GELU, Linear) (ref :551-556).

        All three embeddings the reference constructor can build
        (``unet_attn_3d.py:540-556``) are converted: SinusoidalPosEmb is
        stateless (nothing to map; select it with ``time_sin_pos=True``),
        LearnedFourier freqs/phases are trainable params, RandomFourier
        freqs/phases are frozen buffers (``requires_grad=False``, still in
        the state dict, ``:181-208``) and go to the ``constants`` collection.
        ``LearnedSinusoidalPosEmb`` (``:162-178``) is dead code in the
        reference — no constructor path reaches it — so it has no mapping.
        """
        if not sin_pos:
            if learned:
                self.put(f"{dst}/embed/freqs", _np(self._get(f"{src}.0.freqs")))
                self.put(f"{dst}/embed/phases", _np(self._get(f"{src}.0.phases")))
            else:
                self.put_const(f"{dst}/embed/freqs", _np(self._get(f"{src}.0.freqs")))
                self.put_const(f"{dst}/embed/phases", _np(self._get(f"{src}.0.phases")))
        self.linear(f"{src}.1", f"{dst}/fc1")
        self.linear(f"{src}.3", f"{dst}/fc2")


def _resolve_full_attn(full_attn, n_stages: int) -> Tuple[bool, ...]:
    if full_attn:
        return tuple(full_attn)
    return (False,) * (n_stages - 1) + (True,)


def convert_unet3d(
    sd: Dict[str, Any],
    *,
    n_stages: int,
    full_attn: Optional[Sequence[bool]] = None,
    attn_enabled: bool = True,
    time_sin_pos: bool = False,
    time_learned_emb: bool = True,
    src_prefix: str = "",
    ndim: int = 3,
    return_constants: bool = False,
) -> Any:
    """Torch ``Unet3D``/``Unet2D`` state dict -> flax params dict.

    Module order inside each stage follows the reference ModuleLists
    (``unet_attn_3d.py:605-661``): [res1, res2, attn, resample].

    ``return_constants=True`` additionally returns the ``constants``
    collection (frozen RandomFourier freqs/phases when
    ``time_learned_emb=False`` and ``time_sin_pos=False``) as a second value.
    """
    m = _Mapper(sd, src_prefix)
    fa = _resolve_full_attn(full_attn, n_stages)

    m.conv("init_conv", "init_conv")
    m.time_mlp("time_mlp", "time_mlp", sin_pos=time_sin_pos, learned=time_learned_emb)

    for i in range(n_stages):
        m.resnet(f"downs.{i}.0", f"downs_{i}_block1")
        m.resnet(f"downs.{i}.1", f"downs_{i}_block2")
        if attn_enabled:
            m.attn(f"downs.{i}.2", f"downs_{i}_attn", fa[i])
        is_last = i >= n_stages - 1
        if is_last:
            m.conv(f"downs.{i}.3", f"downs_{i}_downsample")
        elif ndim == 3:
            m.conv(f"downs.{i}.3.conv", f"downs_{i}_downsample/conv", dense=True)
        else:  # 2D space-to-depth downsample: Sequential(Rearrange, Conv1x1)
            m.conv(f"downs.{i}.3.1", f"downs_{i}_downsample/conv", dense=True)

    m.resnet("mid_block1", "mid_block1")
    if attn_enabled:
        m.full_attn("mid_attn", "mid_attn")
    m.resnet("mid_block2", "mid_block2")

    fa_r = fa[::-1]
    for i in range(n_stages):
        m.resnet(f"ups.{i}.0", f"ups_{i}_block1")
        m.resnet(f"ups.{i}.1", f"ups_{i}_block2")
        if attn_enabled:
            m.attn(f"ups.{i}.2", f"ups_{i}_attn", fa_r[i])
        is_last = i == n_stages - 1
        if is_last:
            m.conv(f"ups.{i}.3", f"ups_{i}_upsample")
        elif ndim == 3:
            m.conv(f"ups.{i}.3.conv", f"ups_{i}_upsample/conv")
        else:  # 2D nearest upsample: Sequential(Upsample, Conv3x3)
            m.conv(f"ups.{i}.3.1", f"ups_{i}_upsample/conv")

    m.resnet("final_res_block", "final_res_block")
    m.conv("final_conv", "final_conv", dense=True)
    params = traverse_util.unflatten_dict(m.out)
    if return_constants:
        return params, traverse_util.unflatten_dict(m.constants)
    return params


def convert_unet3d_cond(
    sd: Dict[str, Any],
    *,
    n_stages: int,
    full_attn: Optional[Sequence[bool]] = None,
    attn_enabled: bool = True,
    time_sin_pos: bool = False,
    time_learned_emb: bool = True,
    src_prefix: str = "",
    variant: str = "v3",
    return_constants: bool = False,
) -> Any:
    """Torch ``Unet3DCond`` state dict -> flax params dict.

    Stage ModuleList layouts per variant:
      * v3: [EmbedATb, MixATb, res1, res2, attn, resample] both paths
        (``cond_v3:696-711,742-757``);
      * v2: [EmbedMixATb, res1, res2, attn, resample] both paths
        (``cond_v2:735-747``) — the combined module's embed_/mix_ convs map
        onto this framework's split EmbedATb + MixATb(no norm, no FiLM);
      * v1: downs [EmbedATb, res1, res2, attn, resample] (``cond_v1:653-667``),
        ups without conditioning (``cond_v1:698-712``).
    """
    m = _Mapper(sd, src_prefix)
    fa = _resolve_full_attn(full_attn, n_stages)

    m.conv("init_conv_ATb", "init_conv_ATb")
    m.conv("init_conv_x", "init_conv_x")
    m.time_mlp("time_mlp", "time_mlp", sin_pos=time_sin_pos, learned=time_learned_emb)

    def fuse_modules(path_prefix: str, dst_prefix: str) -> int:
        """Map the stage's conditioning modules; returns the index offset of
        the first resnet block in the torch ModuleList."""
        if variant == "v3":
            m.embed_atb(f"{path_prefix}.0", f"{dst_prefix}_atb_embed")
            m.mix_atb(f"{path_prefix}.1", f"{dst_prefix}_atb_mix")
            return 2
        if variant == "v2":
            m.conv(f"{path_prefix}.0.embed_conv1", f"{dst_prefix}_atb_embed/conv1")
            m.conv(f"{path_prefix}.0.embed_conv2", f"{dst_prefix}_atb_embed/conv2")
            m.conv(f"{path_prefix}.0.mix_conv1", f"{dst_prefix}_atb_mix/conv1")
            m.conv(f"{path_prefix}.0.mix_conv2", f"{dst_prefix}_atb_mix/conv2")
            return 1
        # v1: additive embed, downs only
        m.embed_atb(f"{path_prefix}.0", f"{dst_prefix}_atb_embed")
        return 1

    for i in range(n_stages):
        off = fuse_modules(f"downs.{i}", f"downs_{i}")
        m.resnet(f"downs.{i}.{off}", f"downs_{i}_block1")
        m.resnet(f"downs.{i}.{off + 1}", f"downs_{i}_block2")
        if attn_enabled:
            m.attn(f"downs.{i}.{off + 2}", f"downs_{i}_attn", fa[i])
        rs = off + 3
        if i >= n_stages - 1:
            m.conv(f"downs.{i}.{rs}", f"downs_{i}_downsample")
        else:
            m.conv(f"downs.{i}.{rs}.conv", f"downs_{i}_downsample/conv", dense=True)

    m.resnet("mid_block1", "mid_block1")
    if attn_enabled:
        m.full_attn("mid_attn", "mid_attn")
    m.resnet("mid_block2", "mid_block2")

    fa_r = fa[::-1]
    for i in range(n_stages):
        if variant == "v1":
            off = 0  # no conditioning modules on the up path
        else:
            off = fuse_modules(f"ups.{i}", f"ups_{i}")
        m.resnet(f"ups.{i}.{off}", f"ups_{i}_block1")
        m.resnet(f"ups.{i}.{off + 1}", f"ups_{i}_block2")
        if attn_enabled:
            m.attn(f"ups.{i}.{off + 2}", f"ups_{i}_attn", fa_r[i])
        rs = off + 3
        if i == n_stages - 1:
            m.conv(f"ups.{i}.{rs}", f"ups_{i}_upsample")
        else:
            m.conv(f"ups.{i}.{rs}.conv", f"ups_{i}_upsample/conv")

    m.resnet("final_res_block", "final_res_block")
    m.conv("final_conv", "final_conv", dense=True)
    params = traverse_util.unflatten_dict(m.out)
    if return_constants:
        return params, traverse_util.unflatten_dict(m.constants)
    return params


def load_lightning_checkpoint(path: str) -> Dict[str, Any]:
    """Deserialise a reference ``.ckpt``: returns state_dict, hparams, ema_shadow.

    The reference persists hyperparameters via ``save_hyperparameters()``
    (``model_train_inference.py:307``) and the EMA shadow dict in the
    checkpoint root (``:475-484``).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "state_dict": ckpt.get("state_dict", ckpt),
        "hparams": dict(ckpt.get("hyper_parameters", {})),
        "ema_shadow": ckpt.get("ema_shadow", {}),
    }


def convert_lightning_module(
    ckpt: Dict[str, Any], *, conditional: bool = False, use_ema: bool = False
) -> Dict[str, Any]:
    """Full conversion of a reference Lightning checkpoint.

    Returns ``{"params": ..., "constants": ..., "embedding": [n_cats, E]}``
    ready for the training/inference apps; ``constants`` holds the frozen
    RandomFourier freqs/phases when the checkpoint was trained with
    ``time_learned_emb=False`` (empty otherwise).  ``use_ema=True``
    substitutes the persisted EMA shadow weights
    (``model_inference_experiments.py:387-403`` semantics).
    """
    sd = dict(ckpt["state_dict"])
    if use_ema and ckpt.get("ema_shadow"):
        for k, v in ckpt["ema_shadow"].items():
            key = k if k.startswith("net.") else f"net.{k}"
            if key in sd:
                sd[key] = v
    hp = ckpt["hparams"]
    mp = {k: hp[k] for k in (
        "time_sin_pos", "time_learned_emb", "full_attn", "attn_enabled"
    ) if k in hp}
    n_stages = len(hp.get("dim_mults", (1, 1, 2, 3, 4)))
    convert = convert_unet3d_cond if conditional else convert_unet3d
    params, constants = convert(
        sd,
        n_stages=n_stages,
        full_attn=mp.get("full_attn"),
        attn_enabled=mp.get("attn_enabled", True),
        time_sin_pos=mp.get("time_sin_pos", False),
        time_learned_emb=mp.get("time_learned_emb", True),
        src_prefix="net.",
        return_constants=True,
    )
    embedding = _np(sd["embedding.weight"])
    return {"params": params, "constants": constants, "embedding": embedding}


# --------------------------------------------------------------------------
# Release-weights format (compact, git-committable)
# --------------------------------------------------------------------------
# Orbax checkpoint dirs carry full f32 optimizer state (~16 bytes/param) and
# are machine-local; demo/fine-tune weight sets instead ship as a directory of
#   weights.msgpack  — {"params", "ema_params", "constants"} cast to bfloat16
#   config.json      — the ExperimentConfig that built the model
#   meta.json        — {"step", "dtype", notes}
# ~2 bytes/param: the 23M-param flagship fits in ~90 MB with EMA included.
# The reference ships trained weights the same way in spirit (GitHub release
# .ckpt files, ``readme.md:27-33``); here the format is flax msgpack.

def _cast_floats(tree: Any, dtype) -> Any:
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating) or x.dtype == jnp.bfloat16:
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def save_release_weights(
    directory: str,
    *,
    params: Any,
    ema_params: Any = None,
    model_constants: Any = None,
    config_json: Optional[str] = None,
    step: Optional[int] = None,
    dtype="bfloat16",
    note: str = "",
) -> None:
    """Export trained weights as a compact, self-describing directory."""
    import json as _json

    import jax.numpy as jnp

    os.makedirs(directory, exist_ok=True)
    cast = jnp.bfloat16 if str(dtype) == "bfloat16" else np.float32
    tree = {
        "params": _cast_floats(params, cast),
        "ema_params": _cast_floats(ema_params, cast) if ema_params is not None else {},
        "constants": dict(model_constants or {}),
    }
    save_model(tree, os.path.join(directory, "weights.msgpack"))
    if config_json is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(config_json)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        _json.dump({"step": step, "dtype": str(dtype), "note": note}, f, indent=1)


def load_release_weights(directory: str, cast_to=np.float32):
    """Load a release-weights dir → (variables_tree, config_or_None, meta).

    ``variables_tree`` has float leaves cast to ``cast_to`` (f32 master by
    default — the models cast to their compute dtype at trace time anyway).
    No template needed: the msgpack is structure-bearing.
    """
    import json as _json

    with open(os.path.join(directory, "weights.msgpack"), "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if cast_to is not None:
        tree = _cast_floats(tree, cast_to)
    config = None
    cfg_path = os.path.join(directory, "config.json")
    if os.path.exists(cfg_path):
        from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig

        with open(cfg_path) as f:
            config = ExperimentConfig.from_json(f.read())
    meta = {}
    meta_path = os.path.join(directory, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
    return tree, config, meta


def is_release_weights_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "weights.msgpack"))
