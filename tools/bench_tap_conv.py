"""Correctness + speed of the tap-folded Pallas conv vs XLA's direct conv.

Shapes: the flagship UNet's hot convs (64³/48ch, 32³/48ch, 16³/96ch at batch
8, plus the up-path concat convs).  Usage: python tools/bench_tap_conv.py
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

from flowtrain_stochastic_interpolation_tpu.ops.tap_conv import tap_conv3d


def fence(x):
    for leaf in jax.tree.leaves(x):
        float(jnp.asarray(leaf).sum())


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


def xla_conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return (out.astype(jnp.float32) + b).astype(x.dtype)


def _chain(conv, r, cin, cout):
    """r chained convs in one program (beats the ~25 ms dispatch floor)."""

    def step(z, _):
        y = conv(z)
        if cout != cin:  # widen/narrow back so the chain type-checks
            reps = -(-cin // cout)
            y = jnp.concatenate([y] * reps, axis=-1)[..., :cin]
        return y * 0.5, None

    def run(x, w, b):
        z, _ = jax.lax.scan(step, x, None, length=r)
        return z

    return run


def bench_rate(make_fn, x, w, b, flops_per, r_hi=12, r_lo=4):
    t_hi = timeit(jax.jit(make_fn(r_hi)), x, w, b)
    t_lo = timeit(jax.jit(make_fn(r_lo)), x, w, b)
    dt = max(t_hi - t_lo, 1e-9)
    per = dt / (r_hi - r_lo)
    return flops_per / per / 1e12, per


def check_and_bench(batch, s, cin, cout, dtype=jnp.bfloat16, grad=False):
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (batch, s, s, s, cin), dtype)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout), jnp.float32)
         * (1.0 / (27 * cin) ** 0.5)).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32) * 0.1

    f_tap = jax.jit(tap_conv3d)
    f_xla = jax.jit(xla_conv)
    y_tap = f_tap(x, w, b)
    y_xla = f_xla(x, w, b)
    err = float(jnp.max(jnp.abs(y_tap.astype(jnp.float32) - y_xla.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_xla.astype(jnp.float32)))) + 1e-9

    flops = 2 * batch * s ** 3 * 27 * cin * cout
    tf_tap, per_tap = bench_rate(
        lambda r: _chain(lambda z: tap_conv3d(z, w, b), r, cin, cout), x, w, b, flops)
    tf_xla, per_xla = bench_rate(
        lambda r: _chain(lambda z: xla_conv(z, w, b), r, cin, cout), x, w, b, flops)
    print(f"b{batch} {s}^3 {cin}->{cout} fwd : tap {per_tap*1e3:7.2f} ms ({tf_tap:5.1f} TF/s)"
          f" | xla {per_xla*1e3:7.2f} ms ({tf_xla:5.1f} TF/s)"
          f" | {per_xla/per_tap:4.2f}x | rel.err {err/scale:.2e}")

    if grad:
        def loss_tap(x, w, b):
            return jnp.sum(tap_conv3d(x, w, b).astype(jnp.float32) ** 2)

        def loss_xla(x, w, b):
            return jnp.sum(xla_conv(x, w, b).astype(jnp.float32) ** 2)

        g_tap = jax.jit(jax.grad(loss_tap, argnums=(0, 1, 2)))
        g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        gt = g_tap(x, w, b)
        gx = g_xla(x, w, b)
        for name, a, bb in zip(("dx", "dw", "db"), gt, gx):
            e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
            sc = float(jnp.max(jnp.abs(bb.astype(jnp.float32)))) + 1e-9
            print(f"    {name} rel.err {e/sc:.2e}")

        def make_grad(conv):
            def mk(r):
                chain = _chain(lambda z: conv(z, w, b), r, cin, cout)

                def loss(x, w_, b_):
                    return jnp.sum(chain(x, w_, b_).astype(jnp.float32) ** 2)

                return jax.grad(loss, argnums=(0,))
            return mk

        tf_gt, per_gt = bench_rate(make_grad(tap_conv3d), x, w, b, 3 * flops)
        tf_gx, per_gx = bench_rate(make_grad(xla_conv), x, w, b, 3 * flops)
        print(f"    fwd+bwd/conv: tap {per_gt*1e3:7.2f} ms ({tf_gt:5.1f} TF/s)"
              f" | xla {per_gx*1e3:7.2f} ms ({tf_gx:5.1f} TF/s) | {per_gx/per_gt:4.2f}x")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    check_and_bench(8, 64, 48, 48, grad=True)
    check_and_bench(8, 32, 48, 48)
    check_and_bench(8, 32, 96, 48)   # up-path concat conv
    check_and_bench(8, 16, 96, 96)
    check_and_bench(1, 128, 48, 48)  # 128³ sampling shape
    check_and_bench(8, 64, 18, 48)   # (init-conv class control, k=3 variant)


if __name__ == "__main__":
    main()
