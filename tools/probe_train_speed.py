"""Diagnose the r5 bench train-section slowdown (21 s/micro-step).

The r5 bench rework initializes the train state on the host CPU
(``init_train_state(host_init=True)``) instead of paying a ~450 s full-shape
``model.init`` remote compile.  The first bench run after the change measured
**21099 ms/micro-step** uniformly across 6 steps (BENCH r5 validation,
2026-08-20) vs the r3/r4 record of ~509 ms — 40× — while the *sampler* with
the same host-drawn params (as closure constants) ran at full speed.

Hypotheses, separated here one factor at a time in ONE process:

A. host-init state, per-step scalar fence  (the failing configuration)
B. same program, state round-tripped through an on-device jitted add
   (normalizes buffer provenance/layout — steps 2+ of A already consume
   program outputs, so if A is uniformly slow and B equals A, provenance
   is exonerated)
C. same as A but fenced once at the END of a 4-step chain (is the per-step
   scalar readback / tunnel roundtrip the cost?)
D. donation removed (jax.jit of the same underlying step without
   donate_argnums) — extra compile; opt-in via --no-donate

Usage: python tools/probe_train_speed.py [--steps 4] [--accum 2] [--no-donate]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
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


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--no-donate", action="store_true")
    args = p.parse_args()

    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
    from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

    config = unconditional_64()
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, batch_size=args.batch),
        training=dataclasses.replace(
            config.training, accumulate_grad_batches=args.accum
        ),
    )
    t0 = time.perf_counter()
    model, tx, state = init_train_state(config, host_init=True)
    note(f"host-init state in {time.perf_counter() - t0:.1f}s")
    train_step = make_train_step(model, tx, config)
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), args.batch,
                                    config.data.shape)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, key)
    float(metrics["train_loss"])
    note(f"compile+first step {time.perf_counter() - t0:.1f}s")

    results = {}

    def timed(tag, st):
        times = []
        for i in range(args.steps):
            ts = time.perf_counter()
            st, m = train_step(st, batch, jax.random.fold_in(key, i))
            float(m["train_loss"])
            times.append((time.perf_counter() - ts) * 1e3)
        results[tag] = [round(t, 1) for t in times]
        note(f"{tag}: " + ", ".join(f"{t:.0f}" for t in times))
        return st

    # A — continue from the donated chain (the bench configuration)
    state = timed("A_hostinit_fenced", state)

    # B — normalize provenance: fresh host-init state round-tripped through
    # an on-device jitted computation (forces newly allocated device buffers
    # with XLA-chosen output layouts, not device_put transfers)
    _, _, state_b = init_train_state(config, host_init=True)
    normalize = jax.jit(
        lambda s: jax.tree.map(lambda a: a + jnp.zeros((), a.dtype), s)
    )
    state_b = normalize(state_b)
    jax.block_until_ready(state_b)
    state_b = timed("B_device_roundtrip", state_b)

    # C — chain without per-step fences (one fence at the end): is the
    # per-step scalar readback the cost?
    st = state_b
    ts = time.perf_counter()
    last = None
    for i in range(args.steps):
        st, last = train_step(st, batch, jax.random.fold_in(key, 100 + i))
    float(last["train_loss"])
    chain = (time.perf_counter() - ts) / args.steps * 1e3
    results["C_chain_single_fence_ms"] = round(chain, 1)
    note(f"C_chain_single_fence: {chain:.0f} ms/step avg")

    if args.no_donate:
        step_nd = jax.jit(train_step.__wrapped__)
        t0 = time.perf_counter()
        st2, m = step_nd(state_b, batch, key)
        float(m["train_loss"])
        note(f"no-donate compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for i in range(args.steps):
            ts = time.perf_counter()
            st2, m = step_nd(st2, batch, jax.random.fold_in(key, i))
            float(m["train_loss"])
            times.append((time.perf_counter() - ts) * 1e3)
        results["D_no_donate"] = [round(t, 1) for t in times]
        note("D_no_donate: " + ", ".join(f"{t:.0f}" for t in times))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
