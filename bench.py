"""Headline benchmark: 64³ samples/min at fixed NFE (ODE sampler).

Runs the flagship unconditional pipeline (reference config: dim=48,
mults (1,1,2,3,4), 18 embedding channels, 64³ voxels — ``readme.md:38-43``)
end-to-end on the available accelerator: N(0,1) → fixed-NFE RK4 flow
integration → cosine decode, and reports samples/min.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the reference PyTorch implementation's
measured throughput on this host's CPU (the reference's own
``--infer-device cpu`` recipe, BASELINE.md config 1), extrapolated from
single-forward timing at the same NFE — see BASELINE.md for the measurement.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: the 64³ sampler program is large and the
# axon remote compile is slow — cache it across processes so repeat bench
# runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

# Reference torch-CPU baseline on this host, samples/min at NFE=120
# (measured 2026-08-16 via tools/measure_baseline.py: 16.64 s/forward at the
# flagship config, 22.98M params => 0.0301 samples/min; see BASELINE.md).
BASELINE_SAMPLES_PER_MIN = 0.0301

NFE = 120  # 16 frames × 2 substeps × 4 RK4 stages = (16-1)*2*4 = 120
N_FRAMES = 16
SUBSTEPS = 2
BATCH = 4
N_BATCHES = 3


def main() -> None:
    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.ops.embedding import (
        decode,
        simplex_embedding,
    )
    from flowtrain_stochastic_interpolation_tpu.solvers import solve_ode
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

    config = unconditional_64()
    model = build_model(config)
    shape = config.data.shape
    e = config.data.embedding_dim

    key = jax.random.PRNGKey(100)
    x_init = jnp.zeros((BATCH, *shape, e), jnp.float32)
    t_init = jnp.zeros((BATCH,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init, t_init)
    table = jnp.asarray(simplex_embedding(config.data.num_categories, e))

    def velocity(x, t):
        return model.apply(variables, x, t)

    @jax.jit
    def sample(key):
        x0 = jax.random.normal(key, (BATCH, *shape, e), jnp.float32)
        traj = solve_ode(
            velocity, x0, t0=0.001, tf=1.0, n_frames=N_FRAMES,
            substeps=SUBSTEPS, method="rk4",
        )
        return decode(traj[-1], table)

    # warmup / compile
    sample(key).block_until_ready()

    t0 = time.perf_counter()
    for i in range(N_BATCHES):
        sample(jax.random.fold_in(key, i)).block_until_ready()
    elapsed = time.perf_counter() - t0

    samples_per_min = (N_BATCHES * BATCH) / elapsed * 60.0
    vs = samples_per_min / BASELINE_SAMPLES_PER_MIN if BASELINE_SAMPLES_PER_MIN else None
    print(json.dumps({
        "metric": f"uncond_64cubed_samples_per_min_nfe{NFE}",
        "value": round(samples_per_min, 3),
        "unit": "samples/min",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
