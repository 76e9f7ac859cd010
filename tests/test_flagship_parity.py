"""Flagship-scale forward parity vs the reference torch models (opt-in slow).

The tiny-config parity tests (``test_model_parity.py``) prove the conversion
math; this one proves it at the *published* scale — dim=48, full mults, 64³
input — where one torch-CPU forward costs ~17 s (tools/measure_baseline.py).
Opt-in via ``RUN_SLOW_PARITY=1`` (a full run is several minutes on CPU).

Reference flow exercised: build the reference architecture with random
weights, convert the state dict (``models/persistence.py``), run ONE forward
through both frameworks on the same input, compare.  This is exactly the path
that converted release weights (``unconditional-weights.ckpt``,
``model_train_inference.py:816-846``) take through the framework.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flowtrain_stochastic_interpolation_tpu.models import UNet3D, UNet3DCond  # noqa: E402
from flowtrain_stochastic_interpolation_tpu.models.persistence import (  # noqa: E402
    convert_unet3d,
    convert_unet3d_cond,
)

slow = pytest.mark.skipif(
    os.environ.get("RUN_SLOW_PARITY") != "1",
    reason="flagship-scale parity is slow (one ~17s torch forward); set RUN_SLOW_PARITY=1",
)

FLAGSHIP_UNCOND = dict(
    dim=48, dim_mults=(1, 1, 2, 3, 4), data_channels=18, dropout=0.1,
    time_resolution=1024, time_bandwidth=1000.0, time_learned_emb=True,
    attn_dim_head=32, attn_heads=4,
)
FLAGSHIP_COND = dict(
    dim=48, dim_mults=(1, 2, 2, 3, 4), data_channels=15, dropout=0.1,
    time_resolution=1024, time_bandwidth=1000.0, time_learned_emb=True,
    attn_dim_head=32, attn_heads=4,
)


def _load_ref(name: str):
    path = f"/root/reference/src/flowtrain/models/{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _to_jax(x_torch):
    return jnp.asarray(np.transpose(x_torch.detach().numpy(), (0, 2, 3, 4, 1)))


@slow
@torch.no_grad()
def test_unconditional_flagship_forward_parity():
    ref = _load_ref("unet_attn_3d").Unet3D(**FLAGSHIP_UNCOND, flash_attn=False).eval()
    torch.manual_seed(0)

    params = convert_unet3d(
        ref.state_dict(), n_stages=5, full_attn=None,
        time_learned_emb=True, time_sin_pos=False,
    )
    model = UNet3D(**FLAGSHIP_UNCOND, flash_attn=False)

    x_t = torch.randn(1, 18, 64, 64, 64)
    t_t = torch.tensor([0.4])
    y_ref = np.transpose(ref(x_t, t_t).detach().numpy(), (0, 2, 3, 4, 1))

    y = model.apply({"params": params}, _to_jax(x_t), jnp.asarray(t_t.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-3)


@slow
@torch.no_grad()
def test_conditional_flagship_forward_parity():
    ref = _load_ref("unet_attn_3d_cond_v3").Unet3DCond(**FLAGSHIP_COND).eval()
    torch.manual_seed(1)

    params = convert_unet3d_cond(
        ref.state_dict(), n_stages=5, full_attn=None,
        time_learned_emb=True, time_sin_pos=False,
    )
    model = UNet3DCond(**FLAGSHIP_COND, variant="v3")

    x_t = torch.randn(1, 15, 64, 64, 64)
    atb_t = torch.randn(1, 15, 64, 64, 64)
    t_t = torch.tensor([0.6])
    y_ref = np.transpose(ref(x_t, atb_t, t_t).detach().numpy(), (0, 2, 3, 4, 1))

    y = model.apply(
        {"params": params}, _to_jax(x_t), _to_jax(atb_t), jnp.asarray(t_t.numpy())
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-3)
