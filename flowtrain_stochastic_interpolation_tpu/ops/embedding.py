"""Categorical simplex embedding and cosine decoding (pure ops).

Rebuilds the frozen category embedding of the reference Lightning modules
(``/root/reference/project/geodata-3d-unconditional/model_train_inference.py:316-404``):

* the embedding table is the ``n_cats``-point regular simplex, centred at the
  origin of ``n_dims``-space and row-normalised — maximising pairwise angles
  for cosine decoding (``_initialize_embedding``, ``:330-356``);
* ``embed`` maps ``[B, X, Y, Z]`` categorical indices (GeoGen convention:
  air = -1, so indices are shifted by +1) to channels-last
  ``[B, X, Y, Z, E]`` vectors (``:361-370``);
* ``decode`` is nearest-neighbour cosine similarity; optionally returns the
  logits (``:373-404``);
* ``prominence`` is the top1−top2 softmax-probability uncertainty used by the
  in-training inference callback (``callbacks.py:60-87``).

The table lives in plain arrays (non-trainable), mirroring the reference's
``requires_grad=False``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array


def simplex_embedding(n_cats: int, n_dims: int) -> np.ndarray:
    """Origin-centred, row-normalised simplex embedding table [n_cats, n_dims]."""
    assert n_dims >= n_cats, "embedding dim must be >= number of categories"
    m = np.zeros((n_cats, n_dims), dtype=np.float32)
    m[:, :n_cats] = np.eye(n_cats, dtype=np.float32)
    m[:, :n_cats] -= 1.0 / n_cats
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def embed(indices: Array, table: Array, index_offset: int = 1) -> Array:
    """Categorical ``[B, *spatial]`` (or with trailing 1-channel) -> ``[B, *spatial, E]``.

    ``index_offset=1`` matches the reference's air=-1 shift (``:367``).
    """
    if indices.shape[-1] == 1 and indices.ndim > len(table.shape):
        indices = indices[..., 0]
    idx = indices.astype(jnp.int32) + index_offset
    return jnp.take(table, idx, axis=0)


def decode_logits(x: Array, table: Array) -> Array:
    """Cosine-similarity logits ``[..., n_cats]`` for embedded data ``[..., E]``."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    tn = table / jnp.maximum(jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("...e,ce->...c", xn, tn)


def decode(x: Array, table: Array, return_logits: bool = False):
    """Nearest-neighbour cosine decode: ``[..., E]`` -> int ``[...]`` (0-based).

    Note the reference returns the *0-based* table row; callers subtract 1 to
    recover the air=-1 convention (``model_inference_experiments.py:310-317``).
    """
    logits = decode_logits(x, table)
    if return_logits:
        return logits
    return jnp.argmax(logits, axis=-1)


def prominence(logits: Array) -> Array:
    """Top1−top2 softmax probability margin (uncertainty ∈ [0, 1])."""
    probs = jnp.asarray(jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    top2 = jnp.sort(probs, axis=-1)[..., -2:]
    return top2[..., 1] - top2[..., 0]
