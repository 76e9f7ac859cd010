"""Measure flagship training throughput (steps/sec) on the available accelerator.

Driver metric #2 (BASELINE.md): train steps/sec at batch=8 for the flagship
64³ configs.  Runs the real jitted train step (loss + grad + optax + EMA)
on synthetic on-device data.  ``--conditional`` switches to the conditional
recipe (masked losses + ATb pathway).

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import dataclasses

import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--conditional", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--attn-vjp", default=None,
                   help="folded-attention backward mode A/B: closed_form | "
                        "closed_form_bf16 | chunked | autodiff")
    p.add_argument("--micro-batch", type=int, default=None,
                   help="micro-batch with accumulation to effective "
                        "--batch-size (matches bench.py's b4×2 recipe)")
    args = p.parse_args()

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
    accum = 1
    batch_size = args.batch_size
    if args.micro_batch:
        accum = max(1, args.batch_size // args.micro_batch)
        batch_size = args.micro_batch
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, batch_size=batch_size),
        model=dataclasses.replace(config.model, attn_folded_vjp=args.attn_vjp),
        training=dataclasses.replace(
            config.training, accumulate_grad_batches=accum, remat=args.remat
        ),
    )

    model, tx, state = init_train_state(config, host_init=True)
    train_step = make_train_step(model, tx, config)
    batch = synthetic_geology_batch(
        jax.random.PRNGKey(0), config.data.batch_size, config.data.shape
    )
    key = jax.random.PRNGKey(1)

    # Scalar-read fence throughout: on the axon tunnel block_until_ready
    # returns before remote execution completes (verified empirically), so
    # only a value read is a true fence — fencing the compile step with
    # block_until_ready used to leak the compile tail into the timed loop
    # (the r5 29.7 s/"step" artifact).
    t_compile = time.perf_counter()
    state, metrics = train_step(state, batch, key)
    float(metrics["train_loss"])
    compile_s = time.perf_counter() - t_compile

    # 2 warmup steps: the first loop step on a donated state respecializes
    # layouts into a second executable (see tools/probe_train_speed.py)
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, 1000 + i))
        float(metrics["train_loss"])

    step_ms = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
        loss_val = float(metrics["train_loss"])
        step_ms.append((time.perf_counter() - t0) * 1e3)
    dt = sorted(step_ms)[len(step_ms) // 2] / 1e3  # median

    rec = {
        "metric": ("cond" if args.conditional else "uncond")
                  + f"_64cubed_train_steps_per_sec_b{args.batch_size}",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "step_ms": round(dt * 1000, 1),
        "steps_ms": [round(t, 1) for t in step_ms],
        "compile_s": round(compile_s, 1),
        "loss": round(loss_val, 4),
    }
    if args.micro_batch:
        rec["micro_batch"] = config.data.batch_size
        rec["accum"] = accum
        rec["note"] = "step_ms is per MICRO step"
    if args.attn_vjp:
        rec["attn_vjp"] = args.attn_vjp
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
