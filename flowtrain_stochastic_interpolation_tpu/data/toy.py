"""Toy 2D datasets for UNet2D experiments.

Rebuilds ``/root/reference/src/flowtrain/dataloaders/practicedata.py``:
Cholesky-parameterised 2D Gaussians (``:9-41``), a 60/40 two-component
mixture (``:44-77``), and (optionally, when torchvision is installed)
FashionMNIST/CIFAR-10 loaders padded/normalised to ±1 (``:80-124``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class Gaussian2d:
    """2D Gaussian sampled through an explicit Cholesky factor (ref ``:9-41``)."""

    def __init__(self, mean=(0.0, 0.0), chol=((1.0, 0.0), (0.3, 0.8))):
        self.mean = jnp.asarray(mean, jnp.float32)
        self.chol = jnp.asarray(chol, jnp.float32)

    def sample(self, key: Array, n: int) -> Array:
        z = jax.random.normal(key, (n, 2))
        return self.mean + z @ self.chol.T

    @property
    def covariance(self) -> Array:
        return self.chol @ self.chol.T


class GaussianMixed:
    """60/40 two-component Gaussian mixture (reference ``:44-77``)."""

    def __init__(
        self,
        means=((-2.0, -2.0), (2.0, 2.0)),
        chols=(((1.0, 0.0), (0.0, 0.6)), ((0.7, 0.0), (0.2, 1.0))),
        weights=(0.6, 0.4),
    ):
        self.components = [Gaussian2d(m, c) for m, c in zip(means, chols)]
        self.weights = jnp.asarray(weights)

    def sample(self, key: Array, n: int) -> Array:
        k_pick, *k_comp = jax.random.split(key, len(self.components) + 1)
        picks = jax.random.choice(k_pick, len(self.components), (n,), p=self.weights)
        samples = jnp.stack(
            [c.sample(k, n) for c, k in zip(self.components, k_comp)], axis=0
        )
        return samples[picks, jnp.arange(n)]


def get_fashion_mnist(root: str = "./data", train: bool = True) -> Optional[np.ndarray]:
    """FashionMNIST padded to 32×32, normalised to ±1, channels-last [N,32,32,1].

    Reference ``get_fashion_mnist`` (``practicedata.py:97-111``).  Returns
    ``None`` when torchvision is unavailable (optional dependency).
    """
    try:
        from torchvision import datasets  # type: ignore
    except ImportError:
        return None
    ds = datasets.FashionMNIST(root=root, train=train, download=True)
    imgs = ds.data.numpy().astype(np.float32) / 255.0  # [N, 28, 28]
    imgs = np.pad(imgs, ((0, 0), (2, 2), (2, 2)))
    return (imgs * 2.0 - 1.0)[..., None]


def get_cifar10(root: str = "./data", train: bool = True) -> Optional[np.ndarray]:
    """CIFAR-10 normalised to ±1, channels-last [N,32,32,3] (ref ``:114-124``)."""
    try:
        from torchvision import datasets  # type: ignore
    except ImportError:
        return None
    ds = datasets.CIFAR10(root=root, train=train, download=True)
    imgs = np.asarray(ds.data, dtype=np.float32) / 255.0
    return imgs * 2.0 - 1.0


def synthetic_images(key: Array, n: int, size: int = 32) -> Array:
    """Procedural image toy distribution, generated on device.

    Stand-in for the reference's image-toy datasets (``practicedata.py:97-124``)
    in environments without torchvision/network access (this image has zero
    egress — BASELINE.md release-weight note).  Each sample composes, in
    ±1 grayscale on a ``[n, size, size, 1]`` canvas:

    * a linear intensity gradient background with a random orientation,
    * one filled circle (random center / radius / intensity),
    * one axis-aligned filled square (random center / half-width / intensity)
      drawn over the circle.

    The distribution has sharp edges, long-range structure (the gradient),
    and occlusion ordering — enough signal for a UNet2D flow model to learn
    visibly coherent samples in a few hundred steps.
    """
    k_th, k_cc, k_cr, k_ci, k_sc, k_sh, k_si = jax.random.split(key, 7)
    f32 = jnp.float32
    coord = (jnp.arange(size, dtype=f32) + 0.5) / size  # (0, 1)
    yy = coord[:, None]
    xx = coord[None, :]

    theta = jax.random.uniform(k_th, (n, 1, 1), f32, 0.0, 2.0 * jnp.pi)
    bg = 0.5 * (
        (xx - 0.5)[None] * jnp.cos(theta) + (yy - 0.5)[None] * jnp.sin(theta)
    ) * 2.0  # in [-0.5, 0.5] along the gradient direction

    ccy, ccx = jnp.moveaxis(
        jax.random.uniform(k_cc, (n, 2, 1, 1), f32, 0.25, 0.75), 1, 0
    )
    cr = jax.random.uniform(k_cr, (n, 1, 1), f32, 0.10, 0.25)
    ci = jax.random.uniform(k_ci, (n, 1, 1), f32, -1.0, 1.0)
    circle = (xx[None] - ccx) ** 2 + (yy[None] - ccy) ** 2 <= cr**2
    img = jnp.where(circle, ci, bg)

    scy, scx = jnp.moveaxis(
        jax.random.uniform(k_sc, (n, 2, 1, 1), f32, 0.25, 0.75), 1, 0
    )
    sh = jax.random.uniform(k_sh, (n, 1, 1), f32, 0.08, 0.20)
    si = jax.random.uniform(k_si, (n, 1, 1), f32, -1.0, 1.0)
    square = (jnp.abs(xx[None] - scx) <= sh) & (jnp.abs(yy[None] - scy) <= sh)
    img = jnp.where(square, si, img)
    return jnp.clip(img, -1.0, 1.0)[..., None]
