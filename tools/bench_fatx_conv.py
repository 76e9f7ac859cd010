"""Probe: partial phase-fattening of small-channel conv3 on TPU.

The MXU ceiling for a conv with 48 output channels is 48/128 of peak no
matter how the GEMM is oriented.  Phase-fattening trades redundant FLOPs for
lane fill: stride-2 in one axis with a widened kernel packs 2 output phases
into 96 lanes (1.33x K waste), two axes into 192 lanes (1.78x waste).  Full
fattening (8 phases, 384 lanes, 2.37x waste) already measured 0.78x for k=3
(tools/bench_fat_conv.py) — this probes the intermediate points, plus plain
output-channel padding to 64.

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
import numpy as np
from jax import lax


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
    # widened kernel: phase p output at x=2q+p needs taps x' = 2q+p-1..2q+p+1
    # covered by a 4-wide window starting at 2q-1: tap j = 2q-1+j, so
    # w_fat[..., j, ci, p*co+co_] = w[..., j-p+1... build by embedding:
    wf = jnp.zeros((3, 3, 4, ci, 2 * co), jnp.float32)
    wn = w.astype(jnp.float32)
    for p in range(2):
        # output x = 2q+p; window start = 2q-1 => index = p+dx+1... wait,
        # tap index in window = (2q+p+dx-1) - (2q-1) = p+dx  for dx in 0..2
        for dx in range(3):
            wf = wf.at[:, :, p + dx, :, p * co:(p + 1) * co].set(wn[:, :, dx, :, :])
    wf = wf.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 2), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wf, (1, 1, 2), "VALID", dimension_numbers=DN
    )  # [b, d, h, wid//2, 2co]
    out = out.reshape(b, d, h, wid // 2, 2, co).reshape(b, d, h, wid, co)
    return out


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
                    wf = wf.at[:, py + dy, px + dx, :, ph * co:(ph + 1) * co].set(wn[:, dy, dx, :, :])
    wf = wf.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 2), (1, 2), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wf, (1, 2, 2), "VALID", dimension_numbers=DN
    )  # [b, d, h//2, wid//2, 4co]
    out = out.reshape(b, d, h // 2, wid // 2, 2, 2, co)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d, h, wid, co)
    return out


def padded64(x, w):
    wp = jnp.pad(w, ((0, 0),) * 4 + ((0, 64 - w.shape[-1]),))
    out = lax.conv_general_dilated(x, wp, (1, 1, 1), "SAME", dimension_numbers=DN)
    return out[..., : w.shape[-1]]


def main():
    b = 8
    key = jax.random.PRNGKey(0)
    for res, ci, co in [(64, 48, 48), (32, 48, 48), (64, 96, 48)]:
        x = jax.random.normal(key, (b, res, res, res, ci), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co),
                              jnp.bfloat16) * 0.05
        flops = 2 * b * res**3 * 27 * ci * co
        fns = {"direct": direct, "fat_x": fat_x, "fat_xy": fat_xy}
        if co == 48:
            fns["pad64"] = padded64
        ref = None
        row = f"conv3 {res}^3 {ci}->{co}:"
        for tag, fn in fns.items():
            f = jax.jit(lambda a, ww, _fn=fn: _fn(a, ww))
            dt = timeit(f, x, w)
            out = f(x, w)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
            row += f"  {tag} {dt*1e3:6.2f}ms({flops/dt/1e12:5.1f}TF/s,d={err:.0e})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
