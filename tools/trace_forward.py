"""Capture an xplane trace of the flagship unconditional forward.

Warms up the jitted b8 bf16 forward, measures it with a scalar-readback
fence, then records ``--iters`` iterations under ``jax.profiler``.  Feed the
resulting ``*.xplane.pb`` to ``tools/xplane_summary.py`` for a per-op/bucket
time breakdown (the r3 copy audit in ``docs/roofline.md`` came from this
pair).

Usage: python tools/trace_forward.py [--batch 8] [--out /tmp/trace_fwd]
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_fwd")
    args = ap.parse_args()

    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

    config = unconditional_64()
    model = build_model(config)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(
        key, (args.batch, *config.data.shape, config.data.embedding_dim),
        jnp.bfloat16,
    )
    t = jnp.full((args.batch,), 0.5, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32), t[:1])

    fwd = jax.jit(lambda x, t: model.apply(variables, x, t))

    for _ in range(2):
        out = fwd(x, t)
    float(out.astype(jnp.float32).sum())  # scalar readback = axon-safe fence
    t0 = time.perf_counter()
    out = fwd(x, t)
    float(out.astype(jnp.float32).sum())
    print(f"forward: {1e3 * (time.perf_counter() - t0):.1f} ms", flush=True)

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        out = fwd(x, t)
    float(out.astype(jnp.float32).sum())
    jax.profiler.stop_trace()
    print(f"trace written under {args.out} ({args.iters} iterations)", flush=True)


if __name__ == "__main__":
    main()
