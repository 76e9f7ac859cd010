"""Real Lightning-file-layout fixture for the checkpoint converter (VERDICT r3 #7).

``models/persistence.py::load_lightning_checkpoint`` / ``convert_lightning_module``
were proven against randomly-weighted reference *modules*, but had never parsed
a torch-*written* checkpoint file in the reference's Lightning layout.  Here
torch writes one in-test, replicating exactly what the reference persists:

- ``state_dict`` with ``net.*`` / ``embedding.weight`` keys — the module holds
  ``self.net = Unet3D(...)`` + frozen ``self.embedding``
  (``model_train_inference.py:316-323``);
- ``hyper_parameters`` **flat** — Lightning's ``save_hyperparameters()``
  expands the module's ``**model_params`` var-keyword into top-level entries
  (``model_train_inference.py:295-307`` + launch call ``:506-514``);
- ``ema_shadow`` at the checkpoint root with ``net.``-prefixed
  ``named_parameters()`` keys (``on_save_checkpoint`` ``:475-479``,
  shadow update ``callbacks.py:205-215``).

Then the full chain runs: file → converter (EMA substitution) → flax forward
parity vs torch-with-shadow-applied, and the *app* end-to-end
(``apps/unconditional.py --checkpoint-path tiny.ckpt --mode inference``).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-written ckpt + in-process app inference (~1.5 min); fast tier = -m "not slow"

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flowtrain_stochastic_interpolation_tpu.models import UNet3D  # noqa: E402
from flowtrain_stochastic_interpolation_tpu.models.persistence import (  # noqa: E402
    convert_lightning_module,
    load_lightning_checkpoint,
)
from flowtrain_stochastic_interpolation_tpu.ops.embedding import (  # noqa: E402
    simplex_embedding,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# matches config.tiny_test()'s ModelConfig so the app can load the fixture
TINY = dict(
    dim=8, dim_mults=(1, 2), data_channels=15, dropout=0.0,
    self_condition=False, time_resolution=16, time_sin_pos=False,
    time_bandwidth=10.0, time_learned_emb=True, attn_enabled=True,
    attn_dim_head=4, attn_heads=2, full_attn=None, flash_attn=False,
)
N_CATS, EDIM = 15, 15


def _load_ref(name: str):
    path = f"/root/reference/src/flowtrain/models/{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_fixture(path: str) -> "torch.nn.Module":
    """torch-write a checkpoint in the reference's Lightning file layout;
    returns the holder module (with the EMA shadow NOT yet applied)."""
    TorchUnet3D = _load_ref("unet_attn_3d").Unet3D
    torch.manual_seed(7)

    class Holder(torch.nn.Module):  # Geo3DStochInterp's persisted attributes
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(N_CATS, EDIM)
            self.embedding.weight.data.copy_(
                torch.from_numpy(simplex_embedding(N_CATS, EDIM))
            )
            self.embedding.weight.requires_grad = False
            self.net = TorchUnet3D(**TINY)

    holder = Holder().eval()

    # EMA shadow distinguishable from the live weights: a deterministic
    # perturbation per tensor (named_parameters keys, requires_grad only —
    # exactly what the reference EMACallback tracks)
    ema_shadow = {
        name: p.data * 0.95 + 0.01
        for name, p in holder.named_parameters() if p.requires_grad
    }

    hyper_parameters = {
        # explicit init kwargs (model_train_inference.py:296-303)
        "data_shape": (8, 8, 8),
        "time_range": [0.001, 0.999],
        "num_categories": N_CATS,
        "embedding_dim": EDIM,
        "lambda_angle": 0.1,
        "learning_rate": 2e-3,
        "lr_decay": 0.997,
        # **model_params var-keyword — Lightning save_hyperparameters()
        # stores these FLAT at the top level
        **TINY,
    }

    torch.save(
        {
            "state_dict": holder.state_dict(),
            "hyper_parameters": hyper_parameters,
            "ema_shadow": ema_shadow,
            "epoch": 3,
            "global_step": 42,
            "pytorch-lightning_version": "2.5.0",
        },
        path,
    )
    return holder


@torch.no_grad()
def test_lightning_file_converter_parity(tmp_path):
    """file → converter(use_ema) → flax forward == torch forward w/ shadow."""
    ckpt_path = str(tmp_path / "tiny.ckpt")
    holder = _write_fixture(ckpt_path)

    ckpt = load_lightning_checkpoint(ckpt_path)
    assert ckpt["hparams"]["dim_mults"] == (1, 2)

    converted = convert_lightning_module(ckpt, conditional=False, use_ema=True)
    assert converted["embedding"].shape == (N_CATS, EDIM)
    np.testing.assert_allclose(
        converted["embedding"], simplex_embedding(N_CATS, EDIM), rtol=1e-6
    )

    # apply the shadow to the torch module for the ground-truth forward
    sd = holder.state_dict()
    for name, p in holder.named_parameters():
        if p.requires_grad:
            sd[name] = p.data * 0.95 + 0.01
    holder.load_state_dict(sd)

    x_t = torch.randn(2, EDIM, 8, 8, 8)
    t_t = torch.tensor([0.25, 0.8])
    y_ref = holder.net(x_t, t_t).numpy().transpose(0, 2, 3, 4, 1)

    model = UNet3D(**TINY)
    y = model.apply(
        {"params": converted["params"]},
        jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t_t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)

    # without EMA the weights differ (the substitution is observable)
    converted_raw = convert_lightning_module(ckpt, conditional=False, use_ema=False)
    leaf = jax.tree_util.tree_leaves(converted["params"])[0]
    leaf_raw = jax.tree_util.tree_leaves(converted_raw["params"])[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(leaf_raw))


def test_app_inference_from_lightning_file(tmp_path, monkeypatch):
    """apps/unconditional.py --mode inference --checkpoint-path tiny.ckpt,
    end-to-end in-process (reference flow ``model_train_inference.py:816-846``)."""
    ckpt_path = str(tmp_path / "tiny.ckpt")
    _write_fixture(ckpt_path)

    spec = importlib.util.spec_from_file_location(
        "app_uncond", os.path.join(REPO, "apps", "unconditional.py")
    )
    app = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(app)

    monkeypatch.setattr(sys, "argv", [
        "unconditional.py", "--preset", "tiny", "--mode", "inference",
        "--checkpoint-path", ckpt_path, "--n-samples", "2",
        "--batch-size", "2", "--seed", "11", "--no-save-images",
        "--root-dir", str(tmp_path),
    ])
    app.main()

    samples_dir = tmp_path / "samples" / "tiny-smoke"
    decoded = sorted(samples_dir.glob("decoded_s11_*.npy"))
    assert len(decoded) == 2, os.listdir(samples_dir)
    vol = np.load(decoded[0])
    assert vol.shape == (8, 8, 8)
    # 0-based decode minus 1 recovers the GeoGen air=-1 convention
    assert vol.min() >= -1 and vol.max() <= N_CATS - 2
