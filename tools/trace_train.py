"""Capture an xplane trace of the flagship train micro-step (fwd+bwd+Adam).

The forward has a per-op audit (``tools/trace_forward.py`` → the r3 copy
audit in ``docs/roofline.md``); this is the same pair for the *training*
micro-step, whose MFU (9.3 %) trails sampling (13.1 %) — the backward's
dgrad/wgrad convolutions have different GEMM orientations than the forward
and have never been broken down individually.

Usage: python tools/trace_train.py [--batch 4] [--conditional]
       [--out /tmp/trace_train]
Then:  python tools/xplane_summary.py /tmp/trace_train/**/*.xplane.pb <iters>
"""

from __future__ import annotations

import argparse
import dataclasses
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--conditional", action="store_true")
    ap.add_argument("--attn-vjp", default=None,
                    help="folded-attention backward mode (closed_form | "
                         "closed_form_bf16 | chunked | autodiff)")
    ap.add_argument("--out", default="/tmp/trace_train")
    args = ap.parse_args()

    from flowtrain_stochastic_interpolation_tpu.config import (
        conditional_64,
        unconditional_64,
    )
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
    from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

    config = conditional_64() if args.conditional else unconditional_64()
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, batch_size=args.batch),
        model=dataclasses.replace(config.model, attn_folded_vjp=args.attn_vjp),
        training=dataclasses.replace(config.training, accumulate_grad_batches=1),
    )
    model, tx, state = init_train_state(config, host_init=True)
    train_step = make_train_step(model, tx, config)
    batch = synthetic_geology_batch(
        jax.random.PRNGKey(0), args.batch, config.data.shape
    )
    key = jax.random.PRNGKey(1)

    for i in range(2):  # compile + warm
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
        float(metrics["train_loss"])  # scalar fence (axon-safe)
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, jax.random.fold_in(key, 99))
    float(metrics["train_loss"])
    print(f"micro-step: {1e3 * (time.perf_counter() - t0):.1f} ms", flush=True)

    jax.profiler.start_trace(args.out)
    for i in range(args.iters):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, 100 + i))
    float(metrics["train_loss"])
    jax.profiler.stop_trace()
    print(f"trace written under {args.out} ({args.iters} iterations)", flush=True)


if __name__ == "__main__":
    main()
