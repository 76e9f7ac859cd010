"""Ablation-timed breakdown of the flagship UNet forward on TPU.

Where does the 64³ forward spend its time?  Times the full forward and
component ablations / microbenches on the real chip with honest fences
(scalar readback — block_until_ready can return early on the axon tunnel).

Usage: python tools/profile_breakdown.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def fence(x):
    jnp.asarray(x).sum().block_until_ready()
    # scalar host readback = true completion fence on axon
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quick", action="store_true", help="skip microbenches")
    args = ap.parse_args()
    b = args.batch

    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

    config = unconditional_64()
    shape = config.data.shape
    e = config.data.embedding_dim
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, *shape, e), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)

    results = {}

    def bench_model(tag, **model_overrides):
        import dataclasses
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model, **model_overrides)
        )
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), x[:1], t[:1])
        f = jax.jit(lambda xx, tt: model.apply(variables, xx, tt))
        dt = timeit(f, x, t)
        results[tag] = dt
        print(f"{tag:40s} {dt * 1e3:8.1f} ms  ({dt * 1e3 / b:6.1f} ms/sample)")
        return dt

    full = bench_model("full forward (bf16)")
    bench_model("no attention", attn_enabled=False)

    if args.quick:
        return

    # ---- microbenches ---------------------------------------------------
    from flowtrain_stochastic_interpolation_tpu.models.attention import (
        Attention, LinearAttention,
    )
    from flowtrain_stochastic_interpolation_tpu.models.layers import conv_nd
    from flowtrain_stochastic_interpolation_tpu.models.resize import resize3d
    from flax import linen as nn

    # Stage resolutions/channels for dims (1,1,2,3,4), dim=48:
    stages = [(64, 48), (32, 48), (16, 96), (8, 144), (4, 192)]

    for res, ch in stages[:3]:
        xx = jax.random.normal(key, (b, res, res, res, ch), jnp.bfloat16)
        la = LinearAttention(dim=ch, heads=4, dim_head=32, dtype=jnp.bfloat16)
        v = la.init(jax.random.PRNGKey(0), xx[:1])
        f = jax.jit(lambda a: la.apply(v, a))
        dt = timeit(f, xx)
        results[f"linear_attn {res}^3 c{ch}"] = dt
        print(f"{'linear_attn %d^3 c%d' % (res, ch):40s} {dt * 1e3:8.1f} ms")

    # conv3 at stage0
    for res, cin, cout, k in [(64, 48, 48, 3), (64, 18, 48, 7), (32, 48, 48, 3), (16, 96, 96, 3)]:
        xx = jax.random.normal(key, (b, res, res, res, cin), jnp.bfloat16)
        conv = conv_nd(3, cout, k, dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), xx[:1])
        f = jax.jit(lambda a: conv.apply(v, a))
        dt = timeit(f, xx)
        flops = 2 * b * res**3 * k**3 * cin * cout
        tflops = flops / dt / 1e12
        results[f"conv{k} {res}^3 {cin}->{cout}"] = dt
        print(f"{'conv%d %d^3 %d->%d' % (k, res, cin, cout):40s} {dt * 1e3:8.1f} ms  "
              f"({tflops:6.1f} TFLOP/s)")

    # resize
    for res, ch, scale in [(32, 48, 2.0), (64, 48, 0.5)]:
        xx = jax.random.normal(key, (b, res, res, res, ch), jnp.bfloat16)
        f = jax.jit(lambda a: resize3d(a, scale))
        dt = timeit(f, xx)
        results[f"resize3d {res}^3 x{scale}"] = dt
        print(f"{'resize3d %d^3 x%s' % (res, scale):40s} {dt * 1e3:8.1f} ms")

    # RMSNorm + Dense qkv proj at 64^3 (the linear-attn surroundings)
    xx = jax.random.normal(key, (b, 64, 64, 64, 48), jnp.bfloat16)
    dense = nn.Dense(384, use_bias=False, dtype=jnp.bfloat16)
    v = dense.init(jax.random.PRNGKey(0), xx[:1])
    f = jax.jit(lambda a: dense.apply(v, a))
    dt = timeit(f, xx)
    print(f"{'dense 64^3 48->384 (qkv)':40s} {dt * 1e3:8.1f} ms")

    # ---- module-level: conv-only vs full block (elementwise overhead) -----
    from flowtrain_stochastic_interpolation_tpu.models.layers import (
        Downsample, ResnetBlock, RMSNorm, Upsample,
    )

    tvec = jax.random.normal(key, (b, 192), jnp.bfloat16)
    for res, ch in [(64, 48), (32, 48)]:
        xx = jax.random.normal(key, (b, res, res, res, ch), jnp.bfloat16)
        # full resblock (2 convs + 2 RMSNorm + FiLM + SiLU + res 1x1)
        rb = ResnetBlock(ch, 3, dtype=jnp.bfloat16)
        v = rb.init(jax.random.PRNGKey(0), xx[:1], tvec[:1])
        f = jax.jit(lambda a, t: rb.apply(v, a, t))
        dt_rb = timeit(f, xx, tvec)
        # the two convs alone (same shapes)
        conv = conv_nd(3, ch, 3, dtype=jnp.bfloat16)
        vc = conv.init(jax.random.PRNGKey(0), xx[:1])
        f2 = jax.jit(lambda a: conv.apply(vc, conv.apply(vc, a)))
        dt_cc = timeit(f2, xx)
        # RMSNorm alone
        nrm = RMSNorm(ch, dtype=jnp.bfloat16)
        vn = nrm.init(jax.random.PRNGKey(0), xx[:1])
        dt_n = timeit(jax.jit(lambda a: nrm.apply(vn, a)), xx)
        print(f"{'resblock %d^3 c%d' % (res, ch):40s} {dt_rb * 1e3:8.1f} ms  "
              f"(2xconv alone {dt_cc * 1e3:6.1f} ms, rmsnorm {dt_n * 1e3:6.1f} ms)")

    for res, cin, cout, Mod in [(64, 48, 48, Downsample), (32, 48, 48, Upsample)]:
        xx = jax.random.normal(key, (b, res, res, res, cin), jnp.bfloat16)
        mod = Mod(cout, 3, dtype=jnp.bfloat16)
        v = mod.init(jax.random.PRNGKey(0), xx[:1])
        dt = timeit(jax.jit(lambda a: mod.apply(v, a)), xx)
        print(f"{'%s %d^3 c%d' % (Mod.__name__, res, cin):40s} {dt * 1e3:8.1f} ms")

    print()
    print(f"attention share of forward: {(full - results['no attention']) * 1e3:.1f} ms "
          f"({100 * (full - results['no attention']) / full:.0f}%)")


if __name__ == "__main__":
    main()
