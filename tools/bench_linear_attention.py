"""A/B: head-folded Pallas linear attention vs XLA einsum path on TPU.

Measures the standalone attention op at the flagship UNet scales and the full
flagship forward with the folded kernel on vs off.

Usage: python tools/bench_linear_attention.py [--batch 8]
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
    args = ap.parse_args()
    b = args.batch

    from flowtrain_stochastic_interpolation_tpu.models.attention import LinearAttention

    key = jax.random.PRNGKey(0)

    # standalone module A/B at each UNet scale (dims (1,1,2,3,4), dim=48)
    for res, ch in [(64, 48), (32, 48), (16, 96)]:
        xx = jax.random.normal(key, (b, res, res, res, ch), jnp.bfloat16)
        row = f"linear_attn {res}^3 c{ch} b{b}:"
        outs = {}
        for tag, folded in [("einsum", False), ("folded", True)]:
            la = LinearAttention(dim=ch, heads=4, dim_head=32,
                                 fused_folded=folded, dtype=jnp.bfloat16)
            v = la.init(jax.random.PRNGKey(0), xx[:1])
            f = jax.jit(lambda a, _la=la, _v=v: _la.apply(_v, a))
            dt = timeit(f, xx)
            outs[tag] = f(xx)
            row += f"  {tag} {dt * 1e3:7.2f} ms"
        err = float(jnp.max(jnp.abs(
            outs["einsum"].astype(jnp.float32) - outs["folded"].astype(jnp.float32)
        )))
        row += f"  max|Δ|={err:.3e}"
        print(row, flush=True)

    # full flagship forward A/B
    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model
    import dataclasses

    config = unconditional_64()
    shape = config.data.shape
    e = config.data.embedding_dim
    x = jax.random.normal(key, (b, *shape, e), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)

    for tag, folded in [("einsum", False), ("folded", True)]:
        cfg = dataclasses.replace(
            config, model=dataclasses.replace(config.model, fused_folded_attn=folded)
        )
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), x[:1], t[:1])
        f = jax.jit(lambda xx, tt, _m=model, _v=variables: _m.apply(_v, xx, tt))
        dt = timeit(f, x, t)
        print(f"full forward b{b} [{tag}]: {dt * 1e3:8.1f} ms "
              f"({dt * 1e3 / b:6.1f} ms/sample)", flush=True)


if __name__ == "__main__":
    main()
