"""Conv-formulation shootout for the flagship UNet's hot convs on TPU.

The forward is ~80% conv time (tools/profile_breakdown.py) at C=48 — far
below MXU peak.  This measures candidate formulations with the op repeated
inside one jitted program (the axon tunnel has a ~50 ms per-dispatch floor,
so single-call timings are useless for <50 ms ops).

Usage: python tools/bench_conv_variants.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

B = 8
ITERS = 20


def fence(x):
    float(jnp.asarray(x).ravel()[0])


def timed_loop(op, x, iters=ITERS, reps=3):
    """Time op repeated `iters` times inside one jitted program."""

    @jax.jit
    def loop(x):
        return lax.fori_loop(0, iters, lambda i, y: op(y), x)

    out = loop(x)
    fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def report(tag, dt, flops):
    print(f"{tag:48s} {dt * 1e3:8.2f} ms   {flops / dt / 1e12:7.1f} TFLOP/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16

    # ------------------------------------------------------------------
    # GEMM ceilings: what can the MXU do at these shapes?
    # ------------------------------------------------------------------
    n = B * 64 ** 3 // 8  # 262144 rows (1 sample worth) to keep mem sane
    for (m, k) in [(48, 48), (48, 1296), (128, 128), (48, 128), (384, 1296), (256, 1296)]:
        a = jax.random.normal(key, (n, k), bf16)
        w = jax.random.normal(key, (k, m), bf16)
        proj = jax.random.normal(key, (m, k), bf16)  # feed output back to input shape

        def op(y, w=w, proj=proj):
            z = jnp.dot(y, w, preferred_element_type=bf16)
            return jnp.dot(z, proj, preferred_element_type=bf16)

        dt = timed_loop(op, a)
        flops = 2 * 2 * n * k * m  # two matmuls per iter
        report(f"gemm [{n}x{k}]@[{k}x{m}] (x2 round-trip)", dt, flops)

    # ------------------------------------------------------------------
    # conv3 48->48 @ 64^3: layout variants
    # ------------------------------------------------------------------
    cin = cout = 48
    res = 64
    flops3 = 2 * B * res ** 3 * 27 * cin * cout
    x_ndhwc = jax.random.normal(key, (B, res, res, res, cin), bf16)
    w3 = jax.random.normal(key, (3, 3, 3, cin, cout), bf16)

    def conv_ndhwc(y):
        return lax.conv_general_dilated(
            y, w3, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    report("conv3 64^3 48->48 NDHWC", timed_loop(conv_ndhwc, x_ndhwc), flops3)

    x_ncdhw = jnp.transpose(x_ndhwc, (0, 4, 1, 2, 3))
    w3_oidhw = jnp.transpose(w3, (4, 3, 0, 1, 2))

    def conv_ncdhw(y):
        return lax.conv_general_dilated(
            y, w3_oidhw, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )

    report("conv3 64^3 48->48 NCDHW", timed_loop(conv_ncdhw, x_ncdhw), flops3)

    # z-decomposed: 3 x 2D convs (merge Z into batch), accumulate z-shifts
    w2 = jax.random.normal(key, (3, 3, 3, cin, cout), bf16)  # [kz, kh, kw, ci, co]

    def conv_z2d(y):
        # y: [B, X, Y, Z, C] -> 2D conv over (X, Y) with Z folded into batch
        yz = jnp.transpose(y, (0, 3, 1, 2, 4)).reshape(B * res, res, res, cin)
        outs = []
        for dz in (-1, 0, 1):
            o = lax.conv_general_dilated(
                yz, w2[dz + 1], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(B, res, res, res, cout)
            # shift along Z: out[z] += conv_dz(x[z+dz])
            if dz == -1:
                o = jnp.concatenate([o[:, 1:], jnp.zeros_like(o[:, :1])], axis=1)
            elif dz == 1:
                o = jnp.concatenate([jnp.zeros_like(o[:, :1]), o[:, :-1]], axis=1)
            outs.append(o)
        out = outs[0] + outs[1] + outs[2]
        return jnp.transpose(out, (0, 2, 3, 1, 4))

    report("conv3 64^3 48->48 3x2Dconv(z-merged)", timed_loop(conv_z2d, x_ndhwc), flops3)

    # f32 comparison
    x_f32 = x_ndhwc.astype(jnp.float32)
    w3_f32 = w3.astype(jnp.float32)

    def conv_f32(y):
        return lax.conv_general_dilated(
            y, w3_f32, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    report("conv3 64^3 48->48 NDHWC f32", timed_loop(conv_f32, x_f32), flops3)

    # channel-padded to 128 (sacrifice FLOPs for lane fill)
    cpad = 128
    xp = jnp.pad(x_ndhwc, ((0, 0),) * 4 + ((0, cpad - cin),))
    w3p = jnp.pad(w3, ((0, 0),) * 3 + ((0, cpad - cin), (0, cpad - cout)))

    def conv_pad(y):
        return lax.conv_general_dilated(
            y, w3p, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    dt = timed_loop(conv_pad, xp)
    report("conv3 64^3 128->128 (48 padded)", dt, flops3)  # useful-FLOP rate

    # ------------------------------------------------------------------
    # init conv7 18->48 @ 64^3
    # ------------------------------------------------------------------
    cin7, cout7 = 18, 48
    flops7 = 2 * B * res ** 3 * 343 * cin7 * cout7
    x18 = jax.random.normal(key, (B, res, res, res, cin7), bf16)
    w7 = jax.random.normal(key, (7, 7, 7, cin7, cout7), bf16)

    def conv7(y):
        o = lax.conv_general_dilated(
            y, w7, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return o[..., :cin7]  # feed back

    report("conv7 64^3 18->48 NDHWC", timed_loop(conv7, x18), flops7)

    # space-to-depth factor 2: 32^3 x 144ch input, kernel 4^3 stride 1 over
    # patches reproduces the same receptive field superset
    x_s2d = x18.reshape(B, 32, 2, 32, 2, 32, 2, cin7).transpose(
        0, 1, 3, 5, 2, 4, 6, 7
    ).reshape(B, 32, 32, 32, 8 * cin7)
    w7_s2d = jax.random.normal(key, (4, 4, 4, 8 * cin7, 8 * cout7), bf16)

    def conv7_s2d(y):
        o = lax.conv_general_dilated(
            y, w7_s2d, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return o[..., : 8 * cin7]

    flops7_s2d = 2 * B * 32 ** 3 * 64 * (8 * cin7) * (8 * cout7)
    report("conv7-as-s2d(4^3 @32^3 144->384) [own FLOPs]",
           timed_loop(conv7_s2d, x_s2d), flops7_s2d)

    # ------------------------------------------------------------------
    # conv3 at deeper stages
    # ------------------------------------------------------------------
    for res_s, ch in [(32, 48), (16, 96), (8, 144)]:
        xs = jax.random.normal(key, (B, res_s, res_s, res_s, ch), bf16)
        ws = jax.random.normal(key, (3, 3, 3, ch, ch), bf16)

        def conv_s(y, ws=ws):
            return lax.conv_general_dilated(
                y, ws, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        fl = 2 * B * res_s ** 3 * 27 * ch * ch
        report(f"conv3 {res_s}^3 {ch}->{ch} NDHWC", timed_loop(conv_s, xs), fl)


if __name__ == "__main__":
    main()
