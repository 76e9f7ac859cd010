"""Measure the conditional flagship train step under rematerialisation.

Context (docs/roofline.md "EmbedATb conv5 remat temp"; BASELINE.md r3 A/B):
cond b4 accum-1 *without* remat OOMs on one v5e chip (17.54G > 15.75G), and
the OOM dump's largest temp is a 2.7×-tile-padded lowering temp of the
EmbedATb k=5 convs.  ``TrainingConfig.remat_save_atb`` keeps those tower
tensors instead of recomputing them in the backward; this tool measures one
configuration per invocation (so an OOM cannot poison the next config —
drive the sweep from a serial shell queue, one axon client at a time):

    python tools/bench_remat.py --batch 4 --remat --save-atb
    python tools/bench_remat.py --batch 4 --remat --no-save-atb
    python tools/bench_remat.py --batch 2            # no-remat baseline

Prints one JSON line: {"config": ..., "step_ms": ..., "oom": false, ...}.
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--save-atb", dest="save_atb", action="store_true", default=True)
    p.add_argument("--no-save-atb", dest="save_atb", action="store_false")
    p.add_argument("--uncond", action="store_true")
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

    name = (
        f"{'uncond' if args.uncond else 'cond'}_b{args.batch}"
        f"_{'remat' if args.remat else 'noremat'}"
        + (("_saveatb" if args.save_atb else "_noatb") if args.remat else "")
    )
    config = unconditional_64() if args.uncond else conditional_64()
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, batch_size=args.batch),
        training=dataclasses.replace(
            config.training, accumulate_grad_batches=1,
            remat=args.remat, remat_save_atb=args.save_atb,
        ),
    )
    model, tx, state = init_train_state(config, host_init=True)
    train_step = make_train_step(model, tx, config)
    b = synthetic_geology_batch(jax.random.PRNGKey(0), args.batch, config.data.shape)
    key = jax.random.PRNGKey(1)

    try:
        t_c = time.perf_counter()
        state, metrics = train_step(state, b, key)
        float(metrics["train_loss"])  # scalar fence (axon tunnel)
        compile_s = time.perf_counter() - t_c

        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, metrics = train_step(state, b, key)
            float(metrics["train_loss"])
            times.append(time.perf_counter() - t0)
        out = {
            "config": name,
            "step_ms": round(sorted(times)[len(times) // 2] * 1000, 1),
            "all_ms": [round(t * 1000, 1) for t in times],
            "compile_s": round(compile_s, 1),
            "oom": False,
        }
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED et al.
        msg = str(e)
        out = {
            "config": name,
            "oom": "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg,
            "error": msg.splitlines()[0][:300],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
