"""Fat (phase-strided) conv vs direct XLA conv at the flagship stage shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax

from flowtrain_stochastic_interpolation_tpu.ops.fat_conv import fat_conv3d

B = 8
ITERS = 20


def fence(x):
    float(jnp.asarray(x).ravel()[0])


def timed_loop(op, x, iters=ITERS, reps=3):
    @jax.jit
    def loop(x):
        return lax.fori_loop(0, iters, lambda i, y: op(y), x)

    fence(loop(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    key = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16

    # (kernel, res, cin, cout) for every hot conv shape in the flagship UNet
    cases = [
        (7, 64, 18, 48),    # init conv
        (3, 64, 48, 48),    # stage-0 res blocks
        (3, 64, 96, 48),    # up-path concat convs
        (3, 32, 48, 48),    # stage-1
        (3, 32, 96, 48),
        (3, 16, 96, 96),    # stage-2 (cout 96 boundary case)
        (3, 16, 48, 96),
        (3, 8, 144, 144),   # stage-3 (cout 144 > 96: fat gated off; measure anyway)
    ]
    for k, res, cin, cout in cases:
        x = jax.random.normal(key, (B, res, res, res, cin), bf16)
        w = jax.random.normal(key, (k, k, k, cin, cout), bf16)
        flops = 2 * B * res ** 3 * k ** 3 * cin * cout

        def direct(y, w=w, cin=cin):
            o = lax.conv_general_dilated(
                y, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return o[..., :cin] if o.shape[-1] != cin else o

        def fat(y, w=w, cin=cin):
            o = fat_conv3d(y, w)
            return o[..., :cin] if o.shape[-1] != cin else o

        # feed-back slicing only valid when cout >= cin
        xd = x if cout >= cin else jax.random.normal(key, (B, res, res, res, cout), bf16)
        if cout < cin:
            # use a square-ish feedback: measure with cin->cout then cout->cin back
            wb = jax.random.normal(key, (1, 1, 1, cout, cin), bf16)

            def direct(y, w=w, wb=wb):
                o = lax.conv_general_dilated(
                    y, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                return lax.conv_general_dilated(
                    o, wb, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

            def fat(y, w=w, wb=wb):
                o = fat_conv3d(y, w)
                return lax.conv_general_dilated(
                    o, wb, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

            xd = x

        dt_d = timed_loop(direct, xd)
        dt_f = timed_loop(fat, xd)
        print(f"k{k} {res}^3 {cin:3d}->{cout:3d}: direct {dt_d*1e3:7.2f} ms "
              f"({flops/dt_d/1e12:5.1f} TF/s) | fat {dt_f*1e3:7.2f} ms "
              f"({flops/dt_f/1e12:5.1f} useful TF/s) | speedup {dt_d/dt_f:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
