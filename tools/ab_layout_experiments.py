"""The r3 layout experiments behind docs/roofline.md's copy audit.

Three measured-and-rejected attacks on the 57 ms/forward of layout copies
(all fenced with scalar readback — ``block_until_ready`` can return at
launch on the axon tunnel):

* ``wide96``  — full-forward A/B with the packed-conv dispatch widened to
  the 96→48 concat convs (measured 1.003×: wash).
* ``resblock`` — toy 64³ resblock chains: per-conv packing vs
  resblock-level packing (pack once, conv→norm→silu→conv packed, unpack
  once), with three per-phase-norm formulations (reshape, block-diagonal
  matmul, lane slices).  Resblock packing is bit-exact but *slower*
  (18.0 → 22.1 ms; BD-norm recovers to 17.6).
* ``barrier`` — ``optimization_barrier`` before RMSNorm's f32 upcast
  (stops XLA hoisting the convert into the conv epilogue and
  materialising a full f32 activation).  Toy 1.09×, full forward 1.005×,
  and the train backward collapses 8.5× (2.67 → 22.7 s/step b4,
  ``tools/measure_train.py``) — rejected.

Usage: python tools/ab_layout_experiments.py {wide96,resblock,barrier}
"""

from __future__ import annotations

import math
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
import numpy as np

C = 48


def fence(x) -> None:
    float(jnp.asarray(x).astype(jnp.float32).sum())


def timeit(fn, *args, reps=3, warmup=1) -> float:
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


def chain_slope(block, x, ws, r_hi=8, r_lo=3) -> float:
    """ms per block via scan-length slope (removes dispatch/epilogue)."""

    def make(r):
        def run(x, *ws):
            def step(z, _):
                return block(z, *ws) * 0.9, None

            z, _ = jax.lax.scan(step, x, None, length=r)
            return z

        return jax.jit(run)

    t_hi = timeit(make(r_hi), x, *ws)
    t_lo = timeit(make(r_lo), x, *ws)
    return (t_hi - t_lo) / (r_hi - r_lo) * 1e3


def _flagship_forward():
    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

    config = unconditional_64()
    model = build_model(config)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(
        key, (8, *config.data.shape, config.data.embedding_dim), jnp.bfloat16
    )
    t = jnp.full((8,), 0.5, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32), t[:1])
    return jax.jit(lambda x, t: model.apply(variables, x, t)), (x, t)


def measure_forward(tag: str, reps: int = 6) -> float:
    fwd, (x, t) = _flagship_forward()
    t0 = time.perf_counter()
    out = fwd(x, t)
    fence(out)
    print(f"{tag}: compile+1 {time.perf_counter() - t0:.1f} s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fwd(x, t)
        fence(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{tag}: median {med * 1e3:.1f} ms", flush=True)
    return med


def exp_wide96() -> None:
    from flowtrain_stochastic_interpolation_tpu.ops import packed_conv

    orig = packed_conv.use_packed_conv

    def wide(shape, cin, cout, kernel):
        if kernel == 3 and len(shape) == 4:
            b, sx, sy, sz = shape
            if sz % 2 == 0 and min(sx, sy, sz) >= 64 and cin <= 96 and cout <= 48:
                return True
        return orig(shape, cin, cout, kernel)

    base = measure_forward("dispatch-current")
    packed_conv.use_packed_conv = wide
    try:
        w = measure_forward("dispatch-wide96 ")
    finally:
        packed_conv.use_packed_conv = orig
    print(f"ratio: {base / w:.3f}x", flush=True)


def _toy_weights():
    w1 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C), jnp.float32) / 36
          ).astype(jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, C, C), jnp.float32) / 36
          ).astype(jnp.bfloat16)
    g1 = jnp.ones((C,), jnp.float32) * 1.1
    g2 = jnp.ones((C,), jnp.float32) * 0.9
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 64, C), jnp.bfloat16)
    return x, w1, w2, g1, g2


def norm48(x, g):
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x / jnp.maximum(n, 1e-12).astype(x.dtype)) * (g * math.sqrt(C)).astype(x.dtype)


def exp_resblock() -> None:
    from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import (
        pack_weights_z2,
        packed_conv3d,
    )

    x, w1, w2, g1, g2 = _toy_weights()
    w1p, w2p = pack_weights_z2(w1), pack_weights_z2(w2)
    g96a, g96b = jnp.tile(g1, 2), jnp.tile(g2, 2)
    bd = jnp.asarray(np.kron(np.eye(2, dtype=np.float32), np.ones((C, C), np.float32)))

    def conv(z, wp):
        return jax.lax.conv_general_dilated(
            z, wp, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def norm_reshape(xp, g96):
        s = xp.shape
        x2 = xp.reshape(*s[:-1], 2, C)
        n = jnp.sqrt(jnp.sum(jnp.square(x2.astype(jnp.float32)), axis=-1,
                             keepdims=True))
        x2 = (x2 / jnp.maximum(n, 1e-12).astype(x2.dtype)) * \
            (g96.reshape(2, C) * math.sqrt(C)).astype(x2.dtype)
        return x2.reshape(s)

    def norm_bd(xp, g96):
        x2 = jnp.square(xp.astype(jnp.float32))
        s = jax.lax.dot_general(
            x2.reshape(-1, 2 * C), bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(xp.shape)
        n = jnp.sqrt(s)
        return (xp / jnp.maximum(n, 1e-12).astype(xp.dtype)) * \
            (g96 * math.sqrt(C)).astype(xp.dtype)

    def norm_slice(xp, g96):
        def one(z):
            n = jnp.sqrt(jnp.sum(jnp.square(z.astype(jnp.float32)), axis=-1,
                                 keepdims=True))
            return z / jnp.maximum(n, 1e-12).astype(z.dtype)

        return jnp.concatenate([one(xp[..., :C]), one(xp[..., C:])], axis=-1) * \
            (g96 * math.sqrt(C)).astype(xp.dtype)

    def rb_per_conv(x, w1, w2, g1, g2):
        h = packed_conv3d(x, w1)
        h = jax.nn.silu(norm48(h, g1))
        h = packed_conv3d(h, w2)
        h = jax.nn.silu(norm48(h, g2))
        return x + h

    def make_packed_rb(normf):
        def rb(x, w1p, w2p, ga, gb):
            s = x.shape
            xp = x.reshape(*s[:-2], s[-2] // 2, 2 * C)
            h = conv(xp, w1p)
            h = jax.nn.silu(normf(h, ga))
            h = conv(h, w2p)
            h = jax.nn.silu(normf(h, gb))
            return (xp + h).reshape(s)

        return rb

    ya = rb_per_conv(x, w1, w2, g1, g2)
    rows = [("A per-conv pack       ", rb_per_conv, (w1, w2, g1, g2))]
    for tag, normf in [("B rb-pack reshape-norm", norm_reshape),
                       ("B rb-pack BD-norm     ", norm_bd),
                       ("B rb-pack slice-norm  ", norm_slice)]:
        rb = make_packed_rb(normf)
        yb = rb(x, w1p, w2p, g96a, g96b)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
        print(f"{tag}: max-abs diff vs A = {err:.3e}", flush=True)
        rows.append((tag, rb, (w1p, w2p, g96a, g96b)))
    for tag, block, ws in rows:
        print(f"{tag}: {chain_slope(block, x, ws):7.2f} ms/resblock", flush=True)


def exp_barrier() -> None:
    from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import packed_conv3d

    x, w1, w2, g1, g2 = _toy_weights()

    def rb(barrier):
        maybe = jax.lax.optimization_barrier if barrier else (lambda z: z)

        def block(x, w1, w2, g1, g2):
            h = packed_conv3d(x, w1)
            h = jax.nn.silu(norm48(maybe(h), g1))
            h = packed_conv3d(h, w2)
            h = jax.nn.silu(norm48(maybe(h), g2))
            return x + h

        return block

    for tag, barrier in [("no barrier", False), ("barrier   ", True)]:
        print(f"{tag}: {chain_slope(rb(barrier), x, (w1, w2, g1, g2)):7.2f} "
              f"ms/resblock", flush=True)
    print("(train-backward impact: run tools/measure_train.py with the barrier "
          "patched into RMSNorm — measured 8.5x WORSE, see docs/roofline.md)",
          flush=True)


if __name__ == "__main__":
    {"wide96": exp_wide96, "resblock": exp_resblock,
     "barrier": exp_barrier}[sys.argv[1]]()
