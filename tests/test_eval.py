"""Sample-quality evaluation statistics (tools/eval_samples.py helpers)."""

import pytest
import jax
import numpy as np

from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
    synthetic_geology_batch,
)

import importlib.util
import os

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


_spec = importlib.util.spec_from_file_location(
    "eval_samples",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "eval_samples.py"),
)
eval_samples = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(eval_samples)


def test_prior_vs_prior_statistics_are_tight():
    """Two independent prior batches must be near-identical under the
    evaluation statistics (the discriminative floor of the tool)."""
    a = np.asarray(synthetic_geology_batch(jax.random.PRNGKey(0), 16, (16, 16, 16)))
    b = np.asarray(synthetic_geology_batch(jax.random.PRNGKey(1), 16, (16, 16, 16)))
    ha = eval_samples.category_histogram(a)
    hb = eval_samples.category_histogram(b)
    assert ha.shape == (15,)
    assert abs(ha.sum() - 1.0) < 1e-6
    tv = 0.5 * float(np.abs(ha - hb).sum())
    assert tv < 0.1, tv
    pa = eval_samples.air_depth_profile(a)
    pb = eval_samples.air_depth_profile(b)
    assert pa.shape == (16,)
    # air sits above the generated surface in both batches
    assert pa[-1] > 0.8 and pa[0] < 0.2
    assert float(np.abs(pa - pb).mean()) < 0.1


def test_degenerate_samples_are_flagged():
    """An all-air 'sample' must sit far from the prior under both stats."""
    ref = np.asarray(synthetic_geology_batch(jax.random.PRNGKey(2), 16, (16, 16, 16)))
    fake = -np.ones((2, 16, 16, 16), np.int32)
    tv = 0.5 * float(
        np.abs(
            eval_samples.category_histogram(fake)
            - eval_samples.category_histogram(ref)
        ).sum()
    )
    assert tv > 0.5, tv
