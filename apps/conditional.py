"""Conditional 64³ reconstruction training CLI.

TPU-native rebuild of
``/root/reference/project/geodata-3d-conditional/model_train_sh_inference_cond.py``:
UNet3DCond(v3) with borehole/surface ATb conditioning, AdamW 1e-3, γ=0.999,
clip 0.3, accum 4, EMA 0.9995 every step (ref ``:59-128``).  Where the
reference spreads over SLURM CPU nodes with Lightning DDP (``:545-557``),
this runs data-parallel over the JAX device mesh — same recipe, one process.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from flowtrain_stochastic_interpolation_tpu.config import conditional_64, tiny_test
from flowtrain_stochastic_interpolation_tpu.train.loop import train
from flowtrain_stochastic_interpolation_tpu.utils.logging import MetricsWriter


def setup_directories(root_dir: str, name: str) -> dict:
    dirs = {
        "checkpoint_dir": os.path.join(root_dir, "saved_models", name),
        "metrics_dir": os.path.join(root_dir, "metrics", name),
        "photo_dir": os.path.join(root_dir, "images", name),
    }
    for p in dirs.values():
        os.makedirs(p, exist_ok=True)
    return dirs


def main():
    p = argparse.ArgumentParser(description="Train the conditional 3D geology model")
    p.add_argument("--steps", type=int, default=None, help="cap training steps")
    p.add_argument("--root-dir", type=str, default=os.path.dirname(os.path.abspath(__file__)))
    p.add_argument("--use-wandb", action="store_true")
    p.add_argument("--preset", choices=["flagship", "tiny"], default="flagship")
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="'cpu' forces the CPU backend before XLA init "
                        "(CI / hosts without the TPU grant)")
    args = p.parse_args()

    # multi-host (pod) wiring — must run before anything touches the XLA
    # backend; no-op without coordinator/SLURM configuration (README runbook)
    from flowtrain_stochastic_interpolation_tpu.parallel import maybe_initialize

    maybe_initialize()
    if args.device == "cpu":
        # must land before the first jax.devices() call — once the TPU
        # backend initialises, the platform can no longer be excluded
        jax.config.update("jax_platforms", "cpu")
    config = conditional_64() if args.preset == "flagship" else tiny_test(conditional=True)
    dirs = setup_directories(args.root_dir, config.name)
    print(f"devices={jax.devices()}")

    from flowtrain_stochastic_interpolation_tpu.train.callbacks import InferenceCallback
    from flowtrain_stochastic_interpolation_tpu.train.loop import build_model

    writer = MetricsWriter(dirs["metrics_dir"], project=config.name, use_wandb=args.use_wandb)
    callback = InferenceCallback(
        config, build_model(config), dirs["photo_dir"],
        every_n_epochs=config.training.inference_every_epochs, writer=writer,
    )
    result = train(
        config, num_steps=args.steps,
        checkpoint_dir=dirs["checkpoint_dir"], writer=writer,
        callback=callback,
    )
    writer.close()
    print(
        f"training: {result.steps_per_sec:.3f} steps/s, "
        f"final loss {result.history[-1]['train_loss']:.4f} "
        f"(flow {result.history[-1]['flow_loss']:.4f}, "
        f"reconstruct {result.history[-1]['reconstruct_loss']:.4f})"
    )


if __name__ == "__main__":
    main()
