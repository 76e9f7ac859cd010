"""Probe: pure-MXU throughput at the flagship conv's candidate GEMM shapes.

Round 2 ruled out a hand-written conv from a probe whose A operand streamed
from HBM ([0.5M x 1296] @ 50 FLOP/byte -> bandwidth-bound at ~40 TF/s), which
says nothing about a VMEM-resident implicit-GEMM conv.  This probe measures
the MXU alone: operands live in VMEM, one block, the dot repeated R times
inside the kernel (varying A by a scalar so reps are not CSE'd), so HBM is
out of the picture.

Hypothesis under test: XLA's direct 3^3/48ch conv at ~27 TF/s is the double
underfill (K=48 contraction depth) x (N=48 lanes) ~= (48/128)^2 of the
128x128 systolic array; folding taps into K (48 -> 144/432/1296) removes the
K penalty and caps at ~74 TF/s (48/128 of 197).

Shapes (M=2048 rows per block, grid loops for volume):
  K=48,   N=48   -- per-tap dot (what XLA direct conv issues)
  K=144,  N=48   -- 3 z-taps folded
  K=432,  N=48   -- (dy,dz) 9 taps folded
  K=1296, N=48   -- all 27 taps folded
  K=1296, N=128  -- lane-fill control
  K=48,   N=1296 -- tap-on-N variant (scatter-add form)

Usage: python tools/bench_mxu_shapes.py
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

R = 256  # dots per grid step (amortise block switch + dispatch floor)


def fence(x):
    # scalar device->host read = true completion fence on the axon tunnel
    # (block_until_ready alone returns at launch, not completion, here)
    float(jnp.asarray(x).sum())


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


def _make_probe_kernel(m_block, reps):
    def kernel(a_ref, b_ref, o_ref):
        # R accumulated dots, each over a DIFFERENT row-window of A (offset
        # slicing is free addressing), so dots cannot be CSE'd, hoisted, or
        # sum-factored (the B-varying form collapses to dot(a, sum b[i])
        # under --xla_allow_excess_precision).
        def body(i, acc):
            a = a_ref[0, pl.ds((i % 32) * 8, m_block), :]
            # max-accumulate: nonlinear, so the R dots cannot be factored
            # into one (dot is bilinear; any linear reduction is foldable)
            return jnp.maximum(acc, jax.lax.dot_general(
                a, b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))

        acc = jax.lax.fori_loop(0, reps, body, jnp.zeros(o_ref.shape, jnp.float32))
        # accumulate into the (revisited) output so no grid step is dead
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] = jnp.maximum(o_ref[...], acc.astype(o_ref.dtype))

    return kernel


def _run(m_block, k, n, grid, reps):
    pad = 32 * 8
    a = jax.random.normal(jax.random.PRNGKey(0), (grid, m_block + pad, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02
    call = pl.pallas_call(
        _make_probe_kernel(m_block, reps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, m_block + pad, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_block, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_block, n), jnp.bfloat16),
    )
    return timeit(jax.jit(call), a, b)


def probe(m_block, k, n, grid):
    # throughput from the slope between R and R/8 reps: cancels dispatch
    # floor, DMA, and any fixed per-grid-step cost
    r_lo = R // 8
    t_hi = _run(m_block, k, n, grid, R)
    t_lo = _run(m_block, k, n, grid, r_lo)
    flops = 2 * m_block * grid * k * n * (R - r_lo)
    dt = max(t_hi - t_lo, 1e-9)
    return flops / dt / 1e12, t_hi


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    print(f"{'shape':>30} | {'TF/s':>7} | {'ms':>8}")
    cases = [
        (2048, 48, 48, 64),
        (2048, 144, 48, 64),
        (2048, 432, 48, 32),
        (2048, 1296, 48, 16),
        (2048, 1296, 128, 8),
        (512, 48, 1296, 64),
        (2048, 1280, 48, 16),   # K multiple of 128 control
        (2048, 512, 48, 32),    # K pow2 control
        (2048, 1296, 64, 16),   # N=64 control
        (1024, 1296, 48, 32),   # smaller M block
    ]
    for m, k, n, g in cases:
        tf, t = probe(m, k, n, g)
        print(f"[{m}x{k}]@[{k}x{n}] x{g}blk | {tf:7.1f} | {t*1e3:8.2f}")


if __name__ == "__main__":
    main()
