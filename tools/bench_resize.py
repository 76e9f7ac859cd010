"""A/B: gather+lerp vs per-axis-matmul align-corners resize on TPU.

Usage: python tools/bench_resize.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from flowtrain_stochastic_interpolation_tpu.models import resize as rz

R = 10


def fence(x):
    jnp.asarray(x).sum().block_until_ready()
    float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    b = args.batch
    key = jax.random.PRNGKey(0)

    for res, ch, scale in [(64, 48, 0.5), (32, 48, 2.0), (32, 48, 0.5), (16, 96, 2.0)]:
        x = jax.random.normal(key, (b, res, res, res, ch), jnp.bfloat16)
        row = f"resize {res}^3 c{ch} x{scale}:"
        outs = {}
        for tag, use_gather in [("matmul", False), ("gather", True)]:
            rz._USE_GATHER = use_gather

            def chain(a):
                # down-then-up round trip keeps shapes stable across reps
                for _ in range(R):
                    y = rz.resize3d(a, scale)
                    a = rz.resize3d(y, 1.0 / scale) * 0.5 + a * 0.5
                return a

            f = jax.jit(chain)
            dt = timeit(f, x)
            outs[tag] = f(x)
            row += f"  {tag} {dt*1e3/R:6.2f}ms/iter"
        err = float(jnp.max(jnp.abs(
            outs["matmul"].astype(jnp.float32) - outs["gather"].astype(jnp.float32))))
        row += f"  max|Δ|={err:.1e}"
        print(row, flush=True)
    rz._USE_GATHER = True


if __name__ == "__main__":
    main()
