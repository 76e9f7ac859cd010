"""Probe: partial phase-fattening of small-channel conv3 on TPU.

The MXU ceiling for a conv with 48 output channels is 48/128 of peak no
matter how the GEMM is oriented.  Phase-fattening trades redundant FLOPs for
lane fill: stride-2 in one axis with a widened kernel packs 2 output phases
into 96 lanes (1.33x K waste), two axes into 192 lanes (1.78x waste).  Full
fattening (8 phases, 384 lanes, 2.37x waste) already measured 0.78x for k=3
(tools/bench_fat_conv.py) — this probes the intermediate points, plus plain
output-channel padding to 64.

Each variant is looped R times inside one jit program (x = f(x)) so the
~50 ms tunnel dispatch floor amortises away.

Usage: python tools/bench_fatx_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax

R = 10  # conv applications per jit program


def fence(x):
    jnp.asarray(x).sum().block_until_ready()
    float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        times.append(time.perf_counter() - t0)
    return min(times)


DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NDHWC", "DHWIO", "NDHWC"))


def direct(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=DN)


def fat_x(x, w):
    """Exact conv3 via stride-2-in-x, kernel (3,3,4), 2 phases -> 96 lanes."""
    b, d, h, wid, ci = x.shape
    co = w.shape[-1]
    wf = jnp.zeros((3, 3, 4, ci, 2 * co), jnp.float32)
    wn = w.astype(jnp.float32)
    # output x = 2q+p, tap dx in 0..2 -> window index p+dx (window start 2q-1)
    for p in range(2):
        for dx in range(3):
            wf = wf.at[:, :, p + dx, :, p * co:(p + 1) * co].set(wn[:, :, dx, :, :])
    wf = wf.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 2), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wf, (1, 1, 2), "VALID", dimension_numbers=DN
    )  # [b, d, h, wid//2, 2co]
    return out.reshape(b, d, h, wid // 2, 2, co).reshape(b, d, h, wid, co)


def fat_xy(x, w):
    """Exact conv3 via stride-2 in (y,x), kernel (3,4,4), 4 phases -> 192 lanes."""
    b, d, h, wid, ci = x.shape
    co = w.shape[-1]
    wf = jnp.zeros((3, 4, 4, ci, 4 * co), jnp.float32)
    wn = w.astype(jnp.float32)
    for py in range(2):
        for px in range(2):
            ph = py * 2 + px
            for dy in range(3):
                for dx in range(3):
                    wf = wf.at[:, py + dy, px + dx, :, ph * co:(ph + 1) * co].set(
                        wn[:, dy, dx, :, :]
                    )
    wf = wf.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 2), (1, 2), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wf, (1, 2, 2), "VALID", dimension_numbers=DN
    )  # [b, d, h//2, wid//2, 4co]
    out = out.reshape(b, d, h // 2, wid // 2, 2, 2, co)
    return out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d, h, wid, co)


def padded64(x, w):
    wp = jnp.pad(w, ((0, 0),) * 4 + ((0, 64 - w.shape[-1]),))
    out = lax.conv_general_dilated(x, wp, (1, 1, 1), "SAME", dimension_numbers=DN)
    return out[..., : w.shape[-1]]


def main():
    b = 8
    key = jax.random.PRNGKey(0)
    import numpy as np

    for res, c in [(64, 48), (32, 48)]:
        x = jax.random.normal(key, (b, res, res, res, c), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, c),
                              jnp.bfloat16) * (0.15 / c) ** 0.5
        flops = 2 * b * res**3 * 27 * c * c * R
        row = f"conv3 {res}^3 {c}->{c} xR{R}:"
        ref = None
        for tag, fn in [("direct", direct), ("fat_x", fat_x),
                        ("fat_xy", fat_xy), ("pad64", padded64)]:
            def chain(a, ww, _fn=fn):
                for _ in range(R):
                    a = _fn(a, ww)
                return a

            f = jax.jit(chain)
            dt = timeit(f, x, w)
            out = f(x, w)
            if ref is None:
                ref, err = out, 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
            row += f"  {tag} {dt*1e3/R:6.2f}ms({flops/dt/1e12:5.1f}TF/s,d={err:.0e})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
