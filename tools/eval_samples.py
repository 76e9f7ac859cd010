"""Distributional quality evaluation of generated volumes vs the data prior.

The reference never quantifies sample quality (its checks are visual —
WandB slice grids, SURVEY §4); this tool closes that gap with cheap,
reproducible statistics comparing a set of generated samples against a
reference batch drawn from the training data source:

* per-category voxel frequency (generated vs prior) + total-variation
  distance between the two category distributions;
* air-fraction depth profile (the dominant geological structure: air above
  the surface, rock below) + its mean absolute deviation from the prior's
  profile;
* per-sample category diversity (how many of the 15 rock types appear).

Usage:
    python tools/eval_samples.py --samples 'artifacts/train_demo/sample_*.npy' \
        [--ref-batch 64] [--shape 64] [--seed 0] [--json-out path]

Samples are int8/int32 volumes in the GeoGen convention (air = -1, rock
categories 0..13 — reference ``boreholes.py:100``).  Runs on CPU.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def category_histogram(vols: np.ndarray, n_categories: int = 15) -> np.ndarray:
    """Normalised frequency over {air=-1, 0..n_categories-2} → [n_categories]."""
    flat = vols.reshape(-1).astype(np.int64) + 1  # air -> 0
    counts = np.bincount(flat, minlength=n_categories)[:n_categories]
    return counts / max(counts.sum(), 1)


def air_depth_profile(vols: np.ndarray) -> np.ndarray:
    """Air fraction per Z layer, bottom (z=0) → top: [Z]."""
    return (vols == -1).mean(axis=tuple(range(vols.ndim - 1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", default="artifacts/train_demo/sample_*.npy",
                   help="glob of generated [X,Y,Z] .npy volumes (air=-1)")
    p.add_argument("--ref-batch", type=int, default=64,
                   help="number of prior volumes to draw for the reference stats")
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    paths = sorted(glob.glob(args.samples))
    if not paths:
        raise SystemExit(f"no samples match {args.samples!r}")
    gen = np.stack([np.load(p_) for p_ in paths]).astype(np.int32)

    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )

    ref = np.asarray(
        synthetic_geology_batch(
            jax.random.PRNGKey(args.seed), args.ref_batch, (args.shape,) * 3
        )
    ).astype(np.int32)

    hist_gen = category_histogram(gen)
    hist_ref = category_histogram(ref)
    tv = 0.5 * float(np.abs(hist_gen - hist_ref).sum())

    prof_gen = air_depth_profile(gen)
    # reference profile at the generated Z-resolution (profiles are smooth)
    prof_ref = air_depth_profile(ref)
    if prof_ref.shape != prof_gen.shape:
        prof_ref = np.interp(
            np.linspace(0.0, 1.0, prof_gen.shape[0]),
            np.linspace(0.0, 1.0, prof_ref.shape[0]),
            prof_ref,
        )
    profile_mad = float(np.abs(prof_gen - prof_ref).mean())

    cats_per_sample = [int(len(np.unique(v))) for v in gen]

    report = {
        "n_samples": int(gen.shape[0]),
        "sample_shape": list(gen.shape[1:]),
        "category_tv_distance": round(tv, 4),
        "air_fraction": {
            "generated": round(float(hist_gen[0]), 4),
            "prior": round(float(hist_ref[0]), 4),
        },
        "air_profile_mad": round(profile_mad, 4),
        "air_profile_generated_bottom_mid_top": [
            round(float(prof_gen[0]), 3),
            round(float(prof_gen[len(prof_gen) // 2]), 3),
            round(float(prof_gen[-1]), 3),
        ],
        "air_profile_prior_bottom_mid_top": [
            round(float(prof_ref[0]), 3),
            round(float(prof_ref[len(prof_ref) // 2]), 3),
            round(float(prof_ref[-1]), 3),
        ],
        "categories_per_sample": cats_per_sample,
        "category_freq_generated": [round(float(v), 4) for v in hist_gen],
        "category_freq_prior": [round(float(v), 4) for v in hist_ref],
    }
    out = json.dumps(report, indent=2)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
