"""Ensemble / probabilistic analysis of categorical sample sets.

Rebuilds the reference ensemble pipeline
(``/root/reference/project/geodata-3d-conditional/model_inference_experiments.py:426-480``
and the paper-figures dike-probability path,
``paper-figures/unconditional-and-dike-prob-figs/visualize.py:34-169``):
one-hot voting over an ensemble of decoded volumes → per-voxel category
probabilities → entropy and most-probable-model maps, plus per-category
(e.g. dike) probability volumes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def vote_probabilities(solutions: Array, n_cats: int, index_offset: int = 1) -> Array:
    """Per-voxel category probabilities from an ensemble of decoded volumes.

    Args:
      solutions: int array ``[S, ...]`` of categorical samples using the
        GeoGen convention (air = -1), S = ensemble size.
      n_cats: number of categories (15 for GeoGen).
      index_offset: shift applied before one-hot (air=-1 -> row 0).

    Returns:
      ``[..., n_cats]`` float probabilities (mean one-hot over S).
    """
    onehot = jnp.equal(
        (solutions + index_offset)[..., None], jnp.arange(n_cats)
    ).astype(jnp.float32)
    return jnp.mean(onehot, axis=0)


def entropy(probs: Array, eps: float = 1e-12) -> Array:
    """Per-voxel Shannon entropy ``-sum p log p`` over the category axis."""
    p = jnp.clip(probs, eps, 1.0)
    return -jnp.sum(probs * jnp.log(p), axis=-1)


def most_probable_model(probs: Array, index_offset: int = 1) -> Array:
    """Argmax category per voxel, shifted back to the air=-1 convention."""
    return jnp.argmax(probs, axis=-1) - index_offset


def category_probability(probs: Array, category: int, index_offset: int = 1) -> Array:
    """Probability volume of one category (e.g. dikes) from vote probabilities."""
    return probs[..., category + index_offset]


def air_masked_entropy(probs: Array, index_offset: int = 1, air_threshold: float = 0.5) -> Array:
    """Entropy with confidently-air voxels zeroed (reference ensemble views)."""
    ent = entropy(probs)
    air_prob = probs[..., 0] if index_offset == 1 else probs[..., -1]
    return jnp.where(air_prob > air_threshold, 0.0, ent)
