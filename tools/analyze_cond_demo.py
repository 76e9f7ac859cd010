"""Post-hoc quality analysis of a conditional train-demo ensemble.

Reads ``true_model.npy`` + ``sol_*.npy`` from a train_demo output dir and
reports reconstruction quality: observed-voxel accuracy (overall / air /
rock), most-probable-model accuracy, category histograms, mean entropy.

Usage: python tools/analyze_cond_demo.py [--dir artifacts/train_demo_cond]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts/train_demo_cond")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from flowtrain_stochastic_interpolation_tpu.ops import ensemble
    from flowtrain_stochastic_interpolation_tpu.ops.masks import make_combined_mask

    true = np.load(os.path.join(args.dir, "true_model.npy")).astype(np.int32)
    sols = np.stack([
        np.load(os.path.join(args.dir, f)).astype(np.int32)
        for f in sorted(os.listdir(args.dir)) if f.startswith("sol_")
    ])
    # the demo's held-out scenario mask (same seed as tools/train_demo.py)
    mask = np.asarray(make_combined_mask(jax.random.PRNGKey(998), true[None])[0]) > 0

    air = mask & (true == -1)
    rock = mask & (true != -1)

    def acc(region):
        if region.sum() == 0:
            return float("nan")
        return float((sols[:, region] == true[region][None]).mean())

    probs = np.asarray(ensemble.vote_probabilities(sols, 15))
    mpm = np.asarray(ensemble.most_probable_model(probs))
    ent = np.asarray(ensemble.entropy(probs))

    report = {
        "n_samples": int(sols.shape[0]),
        "observed_frac": round(float(mask.mean()), 3),
        "obs_acc_overall": round(acc(mask), 3),
        "obs_acc_air": round(acc(air), 3),
        "obs_acc_rock": round(acc(rock), 3),
        "mpm_obs_acc": round(float((mpm[mask] == true[mask]).mean()), 3),
        "mpm_unobs_acc": round(float((mpm[~mask] == true[~mask]).mean()), 3),
        "mean_entropy": round(float(ent.mean()), 3),
        "true_categories": int(len(np.unique(true))),
        "sample_categories": int(len(np.unique(sols))),
        "air_frac_true": round(float((true == -1).mean()), 3),
        "air_frac_samples": round(float((sols == -1).mean()), 3),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
