"""Build + execute docs/inference_demo.ipynb.

The executable equivalent of the reference's
``project/geodata-3d-conditional/inference_demo.ipynb`` (24 cells): generate
conditioning scenarios, obtain model weights, populate conditional ensembles,
vote probabilities → entropy maps, visualize.  Runs end-to-end on the tiny
preset in a couple of minutes on CPU so it is always executable (the flagship
path is the same code with ``conditional_64()`` + converted release weights).

Usage: python tools/build_notebook.py [--skip-exec]
"""

from __future__ import annotations

import argparse
import os
import sys

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "inference_demo.ipynb")


def md(s):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    md("""
# Conditional inference demo — flowtrain_stochastic_interpolation_tpu

Executable equivalent of the reference's
`project/geodata-3d-conditional/inference_demo.ipynb` (cells mapped below).
Reconstructs 3D geology from sparse borehole + surface observations with a
conditional stochastic-interpolation UNet, then analyses the ensemble:
per-voxel category probabilities, entropy (uncertainty), most-probable model.

| Reference cell | Here |
|---|---|
| 6 — generate conditioning data | §2 |
| 9 — download checkpoint + EMA load | §1 (release weights when egress exists; quick-trained tiny stand-in otherwise) |
| 12 — populate 9 samples/scenario | §3 |
| 21 — `vote_probabilities` ensemble | §4 |
| 23 — probability / voxel-grid views | §5 |

This notebook runs the **tiny preset** (8³, CPU, ~2 min) so it executes
anywhere; the flagship 64³ flow is the same code with
`config = conditional_64()` and converted release weights
(`models/persistence.py::load_reference_checkpoint`).
"""),
    code("""
# §0 setup — force CPU so the demo runs without an accelerator
import jax
jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import matplotlib.pyplot as plt

import os, sys
sys.path.insert(0, os.path.abspath(".."))  # repo root when run from docs/

from flowtrain_stochastic_interpolation_tpu.config import tiny_test, conditional_64
from flowtrain_stochastic_interpolation_tpu.data.synthetic import synthetic_geology_batch
from flowtrain_stochastic_interpolation_tpu.inference import (
    build_atb, sample_conditional,
)
from flowtrain_stochastic_interpolation_tpu.ops.masks import make_combined_mask
from flowtrain_stochastic_interpolation_tpu.ops import ensemble
from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

config = tiny_test(conditional=True)
config.data.shape, config.model.dim
"""),
    md("""
## §1 — model weights (reference cell 9)

The reference downloads `conditional-weights.ckpt` from its GitHub release
and applies the EMA shadow.  With egress, the same flow here is:

```python
from flowtrain_stochastic_interpolation_tpu.utils.io import download_if_missing
from flowtrain_stochastic_interpolation_tpu.models.persistence import load_reference_checkpoint
ckpt = download_if_missing("conditional-weights.ckpt", RELEASE_URL)
variables, table, hparams = load_reference_checkpoint(ckpt, use_ema=True)
```

This environment has no egress, so we quick-train the tiny conditional model
on the synthetic generator for a few hundred steps instead — enough for the
ensemble mechanics below to be meaningful.
"""),
    code("""
# §1 — quick-train the tiny conditional model (stand-in for release weights)
model, tx, state = init_train_state(config)
train_step = make_train_step(model, tx, config)
key = jax.random.PRNGKey(0)
losses = []
for step in range(300):
    batch = synthetic_geology_batch(jax.random.fold_in(key, step),
                                    config.data.batch_size, config.data.shape)
    state, metrics = train_step(state, batch, key)
    if step % 20 == 0:
        losses.append((step, float(metrics["train_loss"])))
losses[:3], losses[-3:]
"""),
    code("""
# EMA weights for inference (reference applies EMA at train end)
params = state.ema_params if state.ema_params is not None else state.params
variables = {"params": params}
if state.constants.get("model"):
    variables["constants"] = state.constants["model"]
table = state.constants["embedding"]
plt.figure(figsize=(4, 2.5))
plt.plot(*zip(*losses)); plt.xlabel("step"); plt.ylabel("train loss"); plt.title("tiny conditional training")
plt.tight_layout(); plt.show()
"""),
    md("""
## §2 — conditioning data (reference cell 6, `create_cond_data`)

A held-out "true" volume plays the subsurface; `make_combined_mask` builds
the observation operator A — jittered borehole columns ∪ the surface layer
(air voxels + one voxel below).  `ATb = embed(true) * mask` is what the
network sees.
"""),
    code("""
n_scenarios = 2
true_models, masks, atbs = [], [], []
for s in range(n_scenarios):
    true = synthetic_geology_batch(jax.random.PRNGKey(1000 + s), 1, config.data.shape)[0]
    mask = make_combined_mask(jax.random.PRNGKey(2000 + s), true[None])[0]
    atb = build_atb(true, mask, table)
    true_models.append(np.asarray(true)); masks.append(np.asarray(mask)); atbs.append(atb)
obs_frac = [m.mean() for m in masks]
print("observed voxel fraction per scenario:", [round(f, 3) for f in obs_frac])
"""),
    code("""
# visualize a scenario: true model vs observations (z-slices)
s = 0
fig, axes = plt.subplots(2, 4, figsize=(10, 5))
zs = np.linspace(0, config.data.shape[2] - 1, 4).astype(int)
for j, z in enumerate(zs):
    axes[0, j].imshow(true_models[s][:, :, z], cmap="tab20", vmin=-1, vmax=13)
    axes[0, j].set_title(f"true z={z}"); axes[0, j].axis("off")
    obs = np.where(masks[s][:, :, z] > 0, true_models[s][:, :, z], np.nan)
    axes[1, j].imshow(obs, cmap="tab20", vmin=-1, vmax=13)
    axes[1, j].set_title(f"observed z={z}"); axes[1, j].axis("off")
plt.tight_layout(); plt.show()
"""),
    md("""
## §3 — populate conditional ensembles (reference cell 12)

For each scenario, draw an ensemble of reconstructions by integrating the
learned conditional velocity field from different noise seeds
(`seed = 42 + batch` exactly as the reference).
"""),
    code("""
n_samples = 6
solutions = []  # per scenario: [S, X, Y, Z] decoded categorical volumes
for s in range(n_scenarios):
    result = sample_conditional(
        model, variables, table, atbs[s],
        n_samples=n_samples, batch_size=3, seed=42,
        t0=config.inference.t0, tf=config.inference.tf,
        n_frames=config.inference.n_frames, substeps=config.inference.substeps,
        method=config.inference.method, verbose=False,
    )
    solutions.append(result.decoded - 1)  # back to air=-1 convention
solutions[0].shape
"""),
    md("""
## §4 — ensemble analysis (reference cell 21, `vote_probabilities`)

One-hot vote over the ensemble → per-voxel category probabilities →
Shannon entropy (uncertainty) and the most-probable model.
"""),
    code("""
probs = [np.asarray(ensemble.vote_probabilities(sol, config.data.num_categories))
         for sol in solutions]
ent = [np.asarray(ensemble.entropy(p)) for p in probs]
mpm = [np.asarray(ensemble.most_probable_model(p)) for p in probs]
obs_acc = [float(((mpm[s] == true_models[s]) * masks[s]).sum() / max(masks[s].sum(), 1))
           for s in range(n_scenarios)]
print("observed-voxel accuracy of most-probable model:", [round(a, 3) for a in obs_acc])
print("mean entropy:", [round(float(e.mean()), 3) for e in ent])
"""),
    md("""
## §5 — probability & uncertainty views (reference cell 23)

Reconstruction vs truth, and where the ensemble is uncertain.  (The
reference's interactive PyVista voxel grids live in
`apps/paper_figures.py` / `apps/tensorprocessor.py`, gated on a display.)
"""),
    code("""
s = 0
z = config.data.shape[2] // 2
fig, axes = plt.subplots(1, 4, figsize=(12, 3))
for ax, (img, title, kw) in zip(axes, [
    (true_models[s][:, :, z], "true", dict(cmap="tab20", vmin=-1, vmax=13)),
    (mpm[s][:, :, z], "most probable", dict(cmap="tab20", vmin=-1, vmax=13)),
    (ent[s][:, :, z], "entropy", dict(cmap="magma")),
    (solutions[s][0][:, :, z], "sample 0", dict(cmap="tab20", vmin=-1, vmax=13)),
]):
    im = ax.imshow(img, **kw); ax.set_title(title); ax.axis("off")
plt.tight_layout(); plt.show()
"""),
    md("""
---
**Flagship path.**  Replace the tiny preset with the published recipe:

```python
config = conditional_64()                         # dim=48, mults (1,2,2,3,4), 64³
variables, table, _ = load_reference_checkpoint(  # converted torch release weights
    "conditional-weights.ckpt", use_ema=True)
```

Everything below §2 is unchanged — the same `sample_conditional` call runs
the fixed-NFE RK4 sampler jitted on TPU (measured 7.94 samples/min @ NFE=112
on one v5e chip, `BASELINE.md`).
"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-exec", action="store_true")
    args = ap.parse_args()

    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }

    if not args.skip_exec:
        from nbclient import NotebookClient

        client = NotebookClient(
            nb, timeout=1200, kernel_name="python3",
            resources={"metadata": {"path": os.path.join(ROOT, "docs")}},
        )
        client.execute()
        print("executed OK")

    with open(OUT, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
