"""A/B: full (flash) attention at the 16³ stage vs the shipped all-linear mids.

VERDICT r3 #4 / weak #5: the Pallas flash-attention kernel
(`ops/flash_attention.py`) is gated at ≥1024 tokens, but the flagship's only
full-attention stage is the innermost 4³ = 64 tokens — so the kernel never
engages in a shipped config.  The reference leaves the same policy knob to
the user (``full_attn`` per stage, ``unet_attn_3d.py:559-560``; its
flash/SDPA backend pick is ``:376-434``).  This tool measures what enabling
full attention at the 16³ stage (4096 tokens → flash path) costs/buys at the
flagship 64³ scale:

- RK4 sampling chain slope (ms per velocity evaluation, batch 8)
- train micro-step (batch 4), fwd+bwd

Variants:
  base       full_attn = (F,F,F,F,T)  — shipped default (linear mids)
  fa16       full_attn = (F,F,T,F,T)  — full/flash at 16³ + innermost
  fa16_nofl  same, flash_attn=False   — isolates the Pallas kernel's share

Usage: python tools/ab_full_attn16.py [--skip-train]
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
from jax import lax


def _fence(x):
    float(jnp.asarray(x).astype(jnp.float32).ravel()[0])


def _chain_slope(run1, runN, loops, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); _fence(run1())
        t1 = time.perf_counter(); _fence(runN())
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (loops - 1) * 1e3)
    return sorted(ts)[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=4)
    ap.add_argument("--loops", type=int, default=6)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    from flowtrain_stochastic_interpolation_tpu.config import unconditional_64
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )
    from flowtrain_stochastic_interpolation_tpu.train.loop import (
        build_model,
        init_model_variables,
        init_train_state,
    )
    from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

    variants = {
        "base": dict(),
        "fa16": dict(full_attn=(False, False, True, False, True)),
        "fa16_nofl": dict(full_attn=(False, False, True, False, True),
                          flash_attn=False),
    }

    results = {}
    for name, over in variants.items():
        config = unconditional_64()
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, **over)
        )
        model = build_model(config)
        shape = config.data.shape
        e = config.data.embedding_dim
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (args.batch, *shape, e), jnp.bfloat16)
        t = jnp.full((args.batch,), 0.5, jnp.float32)
        variables = init_model_variables(config, key=jax.random.PRNGKey(1),
                                         host=True)
        n_params = sum(p.size for p in jax.tree.leaves(variables))

        def vel_chain(n):
            @jax.jit
            def run(x, t):
                def body(i, xx):
                    return model.apply(variables, xx, t).astype(xx.dtype)
                return lax.fori_loop(0, n, body, x).sum()
            return run

        r1, rn = vel_chain(1), vel_chain(args.loops)
        print(f"[{name}] compiling forward (params {n_params/1e6:.1f}M)...",
              file=sys.stderr, flush=True)
        _fence(r1(x, t)); _fence(rn(x, t))
        fwd_ms = _chain_slope(lambda: r1(x, t), lambda: rn(x, t), args.loops)
        rec = {"fwd_ms_b8": round(fwd_ms, 2)}

        if not args.skip_train:
            cfg_t = dataclasses.replace(
                config,
                data=dataclasses.replace(config.data,
                                         batch_size=args.train_batch),
                training=dataclasses.replace(config.training,
                                             accumulate_grad_batches=1),
            )
            model_t, tx, state = init_train_state(cfg_t, host_init=True)
            train_step = make_train_step(model_t, tx, cfg_t)
            batch = synthetic_geology_batch(
                jax.random.PRNGKey(0), args.train_batch, cfg_t.data.shape
            )
            key = jax.random.PRNGKey(1)
            print(f"[{name}] compiling train step...", file=sys.stderr,
                  flush=True)
            state, metrics = train_step(state, batch, key)
            float(metrics["train_loss"])
            # 2 warmups: the first post-compile step respecializes donated
            # layouts into a second executable (tools/probe_train_speed.py)
            for i in range(2):
                state, metrics = train_step(state, batch,
                                            jax.random.fold_in(key, 900 + i))
                float(metrics["train_loss"])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                state, metrics = train_step(state, batch, key)
                float(metrics["train_loss"])
                ts.append((time.perf_counter() - t0) * 1e3)
            rec["train_micro_ms_b4"] = round(sorted(ts)[len(ts) // 2], 1)

        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    base = results.get("base", {})
    for name, rec in results.items():
        if name == "base":
            continue
        line = {f"{k}_vs_base": round(base[k] / v, 3)
                for k, v in rec.items() if k in base}
        print(json.dumps({name: line}), flush=True)


if __name__ == "__main__":
    main()
