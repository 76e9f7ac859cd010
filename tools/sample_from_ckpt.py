"""Generate samples from a trained orbax checkpoint (demo follow-up)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/root/repo/artifacts/train_demo/ckpt")
    p.add_argument("--out", default="/root/repo/artifacts/train_demo")
    p.add_argument("--n-samples", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--shape", type=int, default=None,
                   help="sampling resolution override (e.g. 128): the UNet is "
                        "fully convolutional + linear-attention, so 64³-trained "
                        "weights run at any /16-divisible size")
    p.add_argument("--ema", action="store_true", help="sample from EMA params")
    p.add_argument("--no-folded", action="store_true",
                   help="disable the folded Pallas linear-attention kernel")
    p.add_argument("--method", default="rk4",
                   choices=["euler", "heun", "midpoint", "rk4", "rk4_tableau",
                            "sde"],
                   help="'sde' runs Euler–Maruyama with the score recovered "
                        "from the velocity checkpoint "
                        "(solvers.solve_velocity_sde; VERDICT r4 #6)")
    p.add_argument("--sde-epsilon", type=float, default=0.5,
                   help="diffusion strength for --method sde")
    p.add_argument("--sde-eps-schedule", default="linear_decay",
                   choices=["constant", "linear_decay"],
                   help="eps(t) schedule: linear_decay keeps the score term "
                        "bounded as t->1 for the linear one-sided schedule")
    p.add_argument("--substeps", type=int, default=2)
    p.add_argument("--state-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype of the integrated state: bfloat16 halves the "
                        "persistent x/k/acc buffers (fits RK4 at 128³ on one "
                        "chip; ~99%% decode agreement vs float32)")
    p.add_argument("--donate-x0", action="store_true",
                   help="donate the noise buffer into the sampler program "
                        "(only saves HBM when an output aliases it — no-op "
                        "for the default decode pipeline; see make_sampler)")
    p.add_argument("--frame-dispatch", action="store_true",
                   help="host-loop one jitted program per saved frame "
                        "instead of one fused ~60 s dispatch (sidesteps the "
                        "tunnel's per-dispatch ceiling at 128³)")
    p.add_argument("--no-prominence", action="store_true",
                   help="skip the prominence map (drops the [B,X,Y,Z,K] "
                        "logits buffer from the program — 126 MB at 128³)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from flowtrain_stochastic_interpolation_tpu.inference import sample_unconditional
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
    from flowtrain_stochastic_interpolation_tpu.train.loop import (
        build_model,
        init_train_state,
    )

    from flowtrain_stochastic_interpolation_tpu.models.persistence import (
        is_release_weights_dir,
        load_release_weights,
    )

    if is_release_weights_dir(args.ckpt):
        tree, config, meta = load_release_weights(args.ckpt)
        assert config is not None, "release-weights dir has no config.json"
        if args.no_folded:
            model_cfg = dataclasses.replace(config.model, fused_folded_attn=False)
            config = dataclasses.replace(config, model=model_cfg)
        model, _, state = init_train_state(config, host_init=True)
        params = tree["params"]
        if args.ema and tree.get("ema_params"):
            params = tree["ema_params"]
        variables = {"params": params}
        if tree.get("constants"):
            variables["constants"] = tree["constants"]
        print(f"loaded release weights (step {meta.get('step')})")
    else:
        mgr = CheckpointManager(args.ckpt, None)
        config = mgr.load_config()
        assert config is not None, "checkpoint dir has no config.json"
        if args.no_folded:
            model_cfg = dataclasses.replace(config.model, fused_folded_attn=False)
            config = dataclasses.replace(config, model=model_cfg)
        model, _, state = init_train_state(config, host_init=True)
        state = mgr.restore(state)
        print(f"restored step {int(state.step)}")

        params = state.params
        if args.ema and state.ema_params is not None:
            params = state.ema_params
        variables = {"params": params}
        if state.constants.get("model"):
            variables["constants"] = state.constants["model"]
    shape = (args.shape,) * 3 if args.shape else tuple(config.data.shape)
    result = sample_unconditional(
        model, variables, state.constants["embedding"],
        n_samples=args.n_samples, batch_size=args.batch_size,
        data_shape=shape, embedding_dim=config.data.embedding_dim,
        seed=100, t0=0.001, tf=1.0, n_frames=16, substeps=args.substeps,
        method=args.method, with_prominence=not args.no_prominence,
        verbose=True, donate_x0=args.donate_x0,
        frame_dispatch=args.frame_dispatch,
        sde_epsilon=args.sde_epsilon,
        sde_eps_schedule=args.sde_eps_schedule,
        state_dtype=jnp.bfloat16 if args.state_dtype == "bfloat16" else jnp.float32,
    )
    dec = result.decoded - 1
    for i in range(min(4, dec.shape[0])):
        np.save(os.path.join(args.out, f"sample_{i}.npy"), dec[i].astype(np.int8))
    try:
        from flowtrain_stochastic_interpolation_tpu.utils.plotting import plot_2d_slices
        plot_2d_slices(dec[0], save_path=os.path.join(args.out, "sample_0_slices.png"))
    except Exception as exc:
        print("plot failed:", exc)

    print(json.dumps({
        "air_frac_top": round(float((dec[..., -8:] == -1).mean()), 3),
        "air_frac_bottom": round(float((dec[..., :8] == -1).mean()), 3),
        "n_categories_used": int(len(np.unique(dec))),
        "prominence_mean": (round(float(result.prominence.mean()), 4)
                            if result.prominence is not None else None),
        "seconds_per_batch": [round(s, 2) for s in result.seconds_per_batch],
    }))


if __name__ == "__main__":
    main()
