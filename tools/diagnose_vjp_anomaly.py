"""Diagnose the r2 conditional closed-form-VJP anomaly (VERDICT r2 weak #1).

Round-2 record (BASELINE.md "Attention-backward A/B"): the conditional
flagship train step at batch 2, accum 1 measured 8.2 s/step with the
closed-form folded-attention VJP, while an autodiff backward in a different
program ran 0.51 s/micro-step — confounded across accum count and program.

This script de-confounds: the SAME program (``make_train_step``, accum 1),
same synthetic batch, sweeping {conditional, batch, backward} one factor at
a time, each timed with per-step scalar fences.  Prints one JSON line per
configuration plus a verdict block.

Usage:  python tools/diagnose_vjp_anomaly.py [--steps 4] [--trace-dir DIR]
        (``--trace-dir`` captures an xplane trace of the slowest config)
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


def measure(conditional: bool, batch: int, steps: int,
            backward: str = "closed_form") -> dict:
    from flowtrain_stochastic_interpolation_tpu.config import (
        conditional_64,
        unconditional_64,
    )
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
    from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

    config = conditional_64() if conditional else unconditional_64()
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, attn_folded_vjp=backward),
        data=dataclasses.replace(config.data, batch_size=batch),
        training=dataclasses.replace(
            config.training, accumulate_grad_batches=1, remat=False
        ),
    )
    # host_init: params drawn on CPU at reduced shape (identical tree) —
    # skips a ~450 s full-shape model.init compile per config on the tunnel
    model, tx, state = init_train_state(config, host_init=True)
    train_step = make_train_step(model, tx, config)
    b = synthetic_geology_batch(jax.random.PRNGKey(0), batch, config.data.shape)
    key = jax.random.PRNGKey(1)

    t_c = time.perf_counter()
    state, metrics = train_step(state, b, key)
    float(metrics["train_loss"])  # scalar fence (axon tunnel)
    compile_s = time.perf_counter() - t_c

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, metrics = train_step(state, b, key)
        float(metrics["train_loss"])
        times.append(time.perf_counter() - t0)
    return {
        "step_ms": round(sorted(times)[len(times) // 2] * 1000, 1),
        "all_ms": [round(t * 1000, 1) for t in times],
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--only", default=None,
                   help="comma list of config names to run (default: all)")
    args = p.parse_args()

    configs = [
        # name, conditional, batch, backward — the backward choice rides the
        # trace-time config field (ModelConfig.attn_folded_vjp), NOT the env
        # var: FLOWTRAIN_AUTODIFF_ATTN_VJP is frozen at module import and
        # flipping it mid-process would silently measure the same program.
        ("cond_b2_closed", True, 2, "closed_form"),   # the reported 8.2 s config
        ("cond_b2_autodiff", True, 2, "autodiff"),    # backward swapped, else same
        ("uncond_b2_closed", False, 2, "closed_form"),  # conditional factor removed
        ("cond_b4_closed", True, 4, "closed_form"),   # batch factor removed
        # r4 bf16 stream-dtype backward A/B (VERDICT r4 #1): the recipe
        # micro-batches, closed_form vs closed_form_bf16, same program shape
        ("uncond_b4_closed", False, 4, "closed_form"),
        ("uncond_b4_bf16", False, 4, "closed_form_bf16"),
        ("cond_b2_bf16", True, 2, "closed_form_bf16"),
    ]
    results = {}
    for name, conditional, batch, backward in configs:
        if args.only and name not in args.only.split(","):
            continue
        r = measure(conditional, batch, args.steps, backward=backward)
        r["config"] = name
        results[name] = r
        print(json.dumps(r), flush=True)

    if args.trace_dir and "cond_b2_closed" in results:
        from flowtrain_stochastic_interpolation_tpu.utils.profiling import trace

        with trace(args.trace_dir):
            measure(True, 2, 1)
        print(f"xplane trace written to {args.trace_dir}", flush=True)

    print(json.dumps({"summary": {k: v["step_ms"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
