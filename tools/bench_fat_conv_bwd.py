"""A/B the 7³ init conv's BACKWARD: phase-fat vs direct form.

The r3 train-step audit (docs/roofline.md) shows the phase-fat init conv's
autodiff backward costs ~30 ms of the 512 ms micro-step (18.9 ms wgrad on the
enlarged [8,8,8,18,384] kernel + 10.8 ms dgrad).  The fat form was selected
on a *forward* A/B (2.25×, tools/bench_fat_conv.py); this measures fwd+bwd
chain slope for both forms at the flagship shape to verify the dispatch is
also right for training.

Chain-slope method: time a jit'd loop of N dependent value_and_grad steps,
subtract the 1-step run, divide — removes dispatch floor and fence cost.

Usage: python tools/bench_fat_conv_bwd.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax


def _fence(x):
    float(jnp.asarray(x).astype(jnp.float32).ravel()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ci", type=int, default=18)
    ap.add_argument("--co", type=int, default=48)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--loops", type=int, default=8)
    args = ap.parse_args()

    from flowtrain_stochastic_interpolation_tpu.ops.fat_conv import fat_conv3d

    k = 7
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(
        key, (args.batch, args.size, args.size, args.size, args.ci), jnp.bfloat16
    )
    w = jax.random.normal(
        jax.random.PRNGKey(1), (k, k, k, args.ci, args.co), jnp.float32
    ) * 0.05

    def direct(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def fat(x, w):
        return fat_conv3d(x, w.astype(x.dtype))

    results = {}
    for name, f in (("direct", direct), ("fat", fat)):
        def loss(w, x):
            return f(x, w).astype(jnp.float32).mean()

        grad = jax.value_and_grad(loss)

        def chain(n):
            @jax.jit
            def run(w, x):
                def body(i, carry):
                    w_, s = carry
                    v, g = grad(w_, x)
                    return (w_ - 1e-6 * g, s + v)
                w_out, s = lax.fori_loop(0, n, body, (w, 0.0))
                return s
            return run

        r1, rn = chain(1), chain(args.loops)
        _fence(r1(w, x)); _fence(rn(w, x))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); _fence(r1(w, x)); t1 = time.perf_counter()
            _fence(rn(w, x)); t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / (args.loops - 1) * 1e3)
        ms = sorted(ts)[1]
        results[name] = ms
        print(f"{name:>6}: {ms:8.2f} ms/fwd+bwd (median of 3 chain-slopes)",
              flush=True)

    print(f"fat/direct fwd+bwd speedup: {results['direct'] / results['fat']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
