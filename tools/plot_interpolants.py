"""Visual verification of the interpolant schedules (2×5 grid figure).

The reference's only automated test plots alpha/beta/gamma and derivatives of
all five interpolants for eyeballing against ``tests/paper-vals.png``
(``/root/reference/tests/test-intepolators.py``).  The numeric golden tests
in ``tests/test_interpolants.py`` supersede it; this script regenerates the
same figure from the TPU implementation for human comparison.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from flowtrain_stochastic_interpolation_tpu.interpolants import (
    EncDecInterpolant,
    LinearInterpolant,
    MirrorInterpolant,
    SBDMInterpolant,
    TrigInterpolant,
)


def main(out_path: str = "/root/repo/artifacts/interpolants.png") -> None:
    one_sided = True
    interpolants = [
        LinearInterpolant(one_sided=one_sided),
        TrigInterpolant(one_sided=one_sided),
        EncDecInterpolant(),
        SBDMInterpolant(),
        MirrorInterpolant(),
    ]
    t = jnp.linspace(0.0, 1.0, 100)
    fig, axs = plt.subplots(2, 5, figsize=(18, 7))
    for i, interp in enumerate(interpolants):
        for row, fns in enumerate(
            [("alpha", "beta", "gamma"), ("alpha_dot", "beta_dot", "gamma_dot")]
        ):
            for name in fns:
                y = np.asarray(getattr(interp, name)(t))
                axs[row, i].plot(np.asarray(t), y, label=name.split("_")[0])
            axs[row, i].legend(fontsize=7)
            axs[row, i].set_title(type(interp).__name__, fontsize=9)
            axs[row, i].set_ylim(-4, 4)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=130, bbox_inches="tight")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/artifacts/interpolants.png")
