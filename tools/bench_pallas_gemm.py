"""Probe: Pallas GEMM at the conv3-48ch shape vs XLA.

The flagship's 64³ convs lower to implicit GEMMs [M=spatial, K=1296, N=48].
XLA's conv runs them at ~27 TF/s; the N=48 lane underfill caps any kernel at
~74 TF/s (48/128 of peak).  This measures how close a simple blocked Pallas
matmul gets at that exact shape — the go/no-go for a hand-written conv
kernel.  Variants: N=48 plain, N=48 with M on lanes (transposed out), and a
sanity N=128 case.

Usage: python tools/bench_pallas_gemm.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # repeats inside one program


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


def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_mm(a, b, block_m=512):
    m, k = a.shape
    n = b.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
    )(a, b)


def _mm_kernel_t(b_ref, a_ref, o_ref):
    # out[n, m_block] = Bt[n, k] @ A[m_block, k]^T  — M on lanes
    o_ref[...] = jax.lax.dot_general(
        b_ref[...], a_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_mm_t(a, bt, block_m=512):
    m, k = a.shape
    n = bt.shape[0]
    return pl.pallas_call(
        _mm_kernel_t,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n, block_m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.bfloat16),
    )(bt, a)


def main():
    key = jax.random.PRNGKey(0)
    m = 8 * 64 * 64 * 16  # 0.5M rows (one z-slab batch-8 worth)
    for k, n in [(1296, 48), (1280, 48), (1296, 128), (144, 48)]:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02
        bt = jnp.asarray(b.T)
        flops = 2 * m * k * n * R

        # loop R times; keep each result's corner so nothing is DCE'd
        # vary B (tiny) per rep so reps aren't CSE'd; A streams unmodified
        def xla_loop(a, b):
            acc = jnp.zeros((), jnp.float32)
            for i in range(R):
                acc += jnp.dot(a, b * (1.0 + i * 1e-6),
                               preferred_element_type=jnp.float32)[0, 0]
            return acc

        def pallas_loop(a, b):
            acc = jnp.zeros((), jnp.float32)
            for i in range(R):
                acc += pallas_mm(a, b * (1.0 + i * 1e-6))[0, 0].astype(jnp.float32)
            return acc

        def pallas_t_loop(a, bt):
            acc = jnp.zeros((), jnp.float32)
            for i in range(R):
                acc += pallas_mm_t(a, bt * (1.0 + i * 1e-6))[0, 0].astype(jnp.float32)
            return acc

        row = f"[{m}x{k}]@[{k}x{n}] xR{R}:"
        for tag, fn, args in [
            ("xla", xla_loop, (a, b)),
            ("pallas", pallas_loop, (a, b)),
            ("pallasT", pallas_t_loop, (a, bt)),
        ]:
            try:
                f = jax.jit(fn)
                dt = timeit(f, *args)
                row += f"  {tag} {dt*1e3/R:7.2f}ms({flops/dt/1e12:5.1f}TF/s)"
            except Exception as exc:
                row += f"  {tag} FAIL({type(exc).__name__})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
