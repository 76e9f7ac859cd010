"""Compile-only HBM accounting for the fused sampler at large resolutions.

Lowers and compiles the exact `make_sampler` program (no execution) and
prints XLA's buffer-assignment peak (`memory_analysis`) per method/dtype —
the tool that turns "UNAVAILABLE: TPU device error" at 128³ into a measured
temp-buffer number (VERDICT r2 weak #6 / next-round item 3).

Usage:
    python tools/memcheck_sampler.py --shape 128 --methods euler rk4 \
        --dtypes float32 bfloat16 [--no-prominence] [--donate]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/root/repo/artifacts/train_demo/ckpt")
    p.add_argument("--shape", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--methods", nargs="+", default=["euler", "rk4"])
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    p.add_argument("--substeps", type=int, default=2)
    p.add_argument("--no-prominence", action="store_true")
    p.add_argument("--donate", action="store_true",
                   help="donate x0 into the program (frees one state buffer)")
    args = p.parse_args()

    from flowtrain_stochastic_interpolation_tpu.inference import make_sampler
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state

    mgr = CheckpointManager(args.ckpt, None)
    config = mgr.load_config()
    assert config is not None, "checkpoint dir has no config.json"
    model, _, state = init_train_state(config, host_init=True)
    state = mgr.restore(state)
    variables = {"params": state.params}
    if state.constants.get("model"):
        variables["constants"] = state.constants["model"]
    table = state.constants["embedding"]
    shape = (args.shape,) * 3
    e = config.data.embedding_dim

    rows = []
    for method in args.methods:
        for dt_name in args.dtypes:
            dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
            x0 = jax.ShapeDtypeStruct((args.batch_size, *shape, e), dt)
            sampler = make_sampler(
                model, variables, table,
                t0=0.001, tf=1.0, n_frames=16, substeps=args.substeps,
                method=method, with_prominence=not args.no_prominence,
                donate_x0=args.donate,
            )
            # make_sampler returns the jitted callable directly for the
            # unconditional path — lower it on the abstract x0.
            lowered = sampler.lower(x0)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            row = {
                "method": method,
                "state_dtype": dt_name,
                "donate": args.donate,
                "prominence": not args.no_prominence,
                "temp_MB": round(ma.temp_size_in_bytes / 2**20, 1),
                "argument_MB": round(ma.argument_size_in_bytes / 2**20, 1),
                "output_MB": round(ma.output_size_in_bytes / 2**20, 1),
                "alias_MB": round(ma.alias_size_in_bytes / 2**20, 1),
                "code_MB": round(ma.generated_code_size_in_bytes / 2**20, 1),
                "peak_MB": round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes - ma.alias_size_in_bytes
                     + ma.generated_code_size_in_bytes) / 2**20, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
