"""Probe: conv3 re-expressed as s2d -> small-kernel 384-ch conv -> d2s."""

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


def s2d(x):
    b, xs, ys, zs, c = x.shape
    x = x.reshape(b, xs // 2, 2, ys // 2, 2, zs // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, xs // 2, ys // 2, zs // 2, 8 * c)


def d2s(x):
    b, xs, ys, zs, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, xs, ys, zs, 2, 2, 2, c)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, 2 * xs, 2 * ys, 2 * zs, c)


def main():
    key = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16
    x = jax.random.normal(key, (B, 64, 64, 64, 48), bf16)
    useful = 2 * B * 64 ** 3 * 27 * 48 * 48

    # transform cost alone
    dt = timed_loop(lambda y: d2s(s2d(y)), x)
    print(f"s2d+d2s round trip 64^3x48:        {dt*1e3:7.2f} ms", flush=True)

    # kernel-2 stride-1 conv at 384 channels, 32^3 (the conv core of the
    # stride-2 k4 fat conv in s2d coordinates)
    xs2 = s2d(x)
    w2 = jax.random.normal(key, (2, 2, 2, 384, 384), bf16)

    def conv_k2(y):
        return lax.conv_general_dilated(
            y, w2, (1, 1, 1), ((1, 0), (1, 0), (1, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    dt = timed_loop(conv_k2, xs2)
    fl = 2 * B * 32 ** 3 * 8 * 384 * 384
    print(f"conv-k2 32^3 384->384 (core):      {dt*1e3:7.2f} ms ({fl/dt/1e12:6.1f} TF/s, "
          f"useful {useful/dt/1e12:5.1f})", flush=True)

    # full pipeline: s2d -> k2 conv -> d2s (exact-equivalent layout variant)
    def pipeline(y):
        return d2s(conv_k2(s2d(y)))

    dt = timed_loop(pipeline, x)
    print(f"s2d->k2conv->d2s pipeline:         {dt*1e3:7.2f} ms (useful {useful/dt/1e12:5.1f} TF/s)",
          flush=True)

    # grouped conv: batch folded into channel groups (8 groups of 48)
    xg = x.transpose(0, 4, 1, 2, 3).reshape(1, B * 48, 64, 64, 64).transpose(0, 2, 3, 4, 1)
    wg = jax.random.normal(key, (3, 3, 3, 48, 384), bf16)

    def conv_grouped(y):
        return lax.conv_general_dilated(
            y, wg, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=8)

    dt = timed_loop(conv_grouped, xg)
    print(f"grouped conv g=8 64^3 384ch:       {dt*1e3:7.2f} ms (useful {useful/dt/1e12:5.1f} TF/s)",
          flush=True)

    # fat conv WITHOUT the per-iter d2s (chain in s2d space): how much of the
    # 12.5ms was transforms?
    from flowtrain_stochastic_interpolation_tpu.ops.fat_conv import fat_conv3d
    w3 = jax.random.normal(key, (3, 3, 3, 48, 48), bf16)

    def fat_only(y):
        return fat_conv3d(y, w3)

    dt = timed_loop(fat_only, x)
    print(f"fat_conv3d (incl transforms):      {dt*1e3:7.2f} ms (useful {useful/dt/1e12:5.1f} TF/s)",
          flush=True)

    # stride-2 k4 conv core alone (no wp build, no d2s)
    w4 = jax.random.normal(key, (4, 4, 4, 48, 384), bf16)

    def core_s2k4(y):
        o = lax.conv_general_dilated(
            y, w4, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.repeat(o, 2, axis=1).reshape(B, 64, 64, 32, 12 * 32)[..., :48] * 1.0 \
            if False else o

    # feed-back: project 384 -> 48 and upsample via d2s to keep shapes; use
    # a fresh input each iter instead (simplest: time one-shot loop on x)
    def core_loop(y):
        o = lax.conv_general_dilated(
            y, w4, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return d2s(o)

    dt = timed_loop(core_loop, x)
    print(f"stride2-k4 conv + d2s (no wp):     {dt*1e3:7.2f} ms (useful {useful/dt/1e12:5.1f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
