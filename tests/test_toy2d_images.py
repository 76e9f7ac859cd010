"""2D image toy: synthetic distribution + UNet2D flow training smoke."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flowtrain_stochastic_interpolation_tpu.data.toy import synthetic_images

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


def test_synthetic_images_shapes_and_range():
    imgs = synthetic_images(jax.random.PRNGKey(0), 8, size=24)
    assert imgs.shape == (8, 24, 24, 1)
    a = np.asarray(imgs)
    assert a.min() >= -1.0 and a.max() <= 1.0
    # structured, not constant: per-image variance well above zero
    assert (a.reshape(8, -1).std(axis=1) > 0.05).all()
    # deterministic in the key
    np.testing.assert_array_equal(
        np.asarray(synthetic_images(jax.random.PRNGKey(0), 8, size=24)), a
    )


def test_unet2d_image_flow_training_reduces_loss():
    """A few dozen steps at 16² must visibly reduce the relative flow MSE
    (the reference's image-toy experiment, unet_2d.py:426-635, in miniature)."""
    from apps.toy2d_images import train_and_sample

    result = train_and_sample(
        steps=40, size=16, dim=8, batch_size=32, lr=3e-3,
        out=None, use_mnist=False, n_grid=2, verbose=False,
    )
    assert result["source"] == "synthetic_images"
    assert result["loss_last"] < 0.8 * result["loss_first"]
    lo, hi = result["sample_minmax"]
    assert -4.0 < lo < hi < 4.0  # samples in a sane range (±1 data + overshoot)
