"""Unconditional 64³ geological generation: train + inference CLI.

TPU-native rebuild of
``/root/reference/project/geodata-3d-unconditional/model_train_inference.py``:
same flags (``--mode train/inference/both --n-samples --batch-size --seed
--checkpoint-path --no-save-images``, ref ``:726-789``), same recipe
(dim=48, mults (1,1,2,3,4), 18-d simplex embedding, Adam 2e-4, γ=0.997,
clip 1.0, accum 24 — ref ``:51-115``), with orbax checkpoints and the
compiled fixed-NFE sampler.  A reference ``.ckpt`` can be supplied directly:
it is converted on the fly (``--checkpoint-path foo.ckpt``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import tiny_test, unconditional_64
from flowtrain_stochastic_interpolation_tpu.inference import sample_unconditional
from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding
from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
from flowtrain_stochastic_interpolation_tpu.train.loop import (
    build_model,
    init_train_state,
    train,
)
from flowtrain_stochastic_interpolation_tpu.utils.logging import MetricsWriter


def setup_directories(root_dir: str, name: str) -> dict:
    dirs = {
        "checkpoint_dir": os.path.join(root_dir, "saved_models", name),
        "photo_dir": os.path.join(root_dir, "images", name),
        "samples_dir": os.path.join(root_dir, "samples", name),
        "metrics_dir": os.path.join(root_dir, "metrics", name),
    }
    for p in dirs.values():
        os.makedirs(p, exist_ok=True)
    return dirs


def load_variables(config, checkpoint_path: str | None, dirs: dict, use_ema: bool = True):
    """Resolve model variables from: torch .ckpt | orbax dir | fresh init."""
    model = build_model(config)
    e = config.data.embedding_dim

    if checkpoint_path and checkpoint_path.endswith(".ckpt"):
        from flowtrain_stochastic_interpolation_tpu.models.persistence import (
            convert_lightning_module,
            load_lightning_checkpoint,
        )

        ckpt = load_lightning_checkpoint(checkpoint_path)
        converted = convert_lightning_module(ckpt, conditional=False, use_ema=use_ema)
        table = jnp.asarray(converted["embedding"])
        variables = {"params": converted["params"]}
        if converted.get("constants"):  # frozen RandomFourier freqs/phases
            variables["constants"] = converted["constants"]
        return model, variables, table

    ckpt_dir = checkpoint_path or dirs["checkpoint_dir"]

    from flowtrain_stochastic_interpolation_tpu.models.persistence import (
        is_release_weights_dir,
        load_release_weights,
    )

    if is_release_weights_dir(ckpt_dir):
        tree, _, meta = load_release_weights(ckpt_dir)
        params = tree["params"]
        if use_ema and tree.get("ema_params"):
            params = tree["ema_params"]
        variables = {"params": params}
        if tree.get("constants"):
            variables["constants"] = tree["constants"]
        table = jnp.asarray(simplex_embedding(config.data.num_categories, e))
        print(f"loaded release weights step {meta.get('step')} from {ckpt_dir}")
        return model, variables, table

    mgr = CheckpointManager(ckpt_dir, None)
    table = jnp.asarray(simplex_embedding(config.data.num_categories, e))
    _, _, state = init_train_state(config, host_init=True)
    if mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"loaded checkpoint step {mgr.latest_step()} from {ckpt_dir}")
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
    else:
        print("WARNING: no checkpoint found — using random init")
        params = state.params
    variables = {"params": params}
    if state.constants.get("model"):
        variables["constants"] = state.constants["model"]
    table = state.constants.get("embedding", table)
    return model, variables, table


UNCOND_WEIGHTS_URL = (
    "https://github.com/chipnbits/flowtrain_stochastic_interpolation/releases/"
    "download/v1.0.0/unconditional-weights.ckpt"
)


def resolve_checkpoint(args, config, dirs) -> str | None:
    """Reference ``main`` weight-resolution (``model_train_inference.py:816-846``):
    an explicit path wins; otherwise, when no local checkpoint exists, fetch
    the released ``unconditional-weights.ckpt`` from the v1.0.0 GitHub release
    (no-op in zero-egress environments — falls back with a warning)."""
    if args.checkpoint_path:
        return args.checkpoint_path
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from flowtrain_stochastic_interpolation_tpu.utils.io import download_if_missing

    if CheckpointManager(dirs["checkpoint_dir"], None).latest_step() is not None:
        return None  # load_variables will use the local orbax checkpoint
    demo_ckpt = os.path.join(dirs["checkpoint_dir"], "unconditional-weights.ckpt")
    if download_if_missing(demo_ckpt, UNCOND_WEIGHTS_URL):
        return demo_ckpt
    return None


def run_inference(args, config, dirs) -> None:
    ckpt = resolve_checkpoint(args, config, dirs) if args.preset == "flagship" else args.checkpoint_path
    model, variables, table = load_variables(config, ckpt, dirs)
    ic = config.inference
    result = sample_unconditional(
        model, variables, table,
        n_samples=args.n_samples,
        batch_size=args.batch_size,
        data_shape=config.data.shape,
        embedding_dim=config.data.embedding_dim,
        seed=args.seed,
        t0=ic.t0, tf=ic.tf, n_frames=ic.n_frames,
        substeps=ic.substeps, method=ic.method, adaptive=args.adaptive,
        keep_trajectory=args.save_trajectories, with_prominence=True,
    )
    for i in range(result.decoded.shape[0]):
        # decoded rows are 0-based; -1 recovers the GeoGen air=-1 convention
        np.save(
            os.path.join(dirs["samples_dir"], f"decoded_s{args.seed}_{i}.npy"),
            result.decoded[i].astype(np.int8) - 1,
        )
        if result.trajectory is not None:
            np.save(
                os.path.join(dirs["samples_dir"], f"fullsol_s{args.seed}_{i}.npy"),
                result.trajectory[:, i],
            )
    if args.save_images:
        from flowtrain_stochastic_interpolation_tpu.utils.plotting import (
            plot_2d_slices,
        )

        for i in range(min(result.decoded.shape[0], 4)):
            plot_2d_slices(
                result.decoded[i] - 1,
                save_path=os.path.join(dirs["photo_dir"], f"cat_slices_{i}.png"),
            )
    total = sum(result.seconds_per_batch)
    print(f"Generated {args.n_samples} samples in {total:.2f}s "
          f"({args.n_samples / total * 60:.1f} samples/min)")


def parse_arguments():
    p = argparse.ArgumentParser(
        description="Train or sample the unconditional 3D geology model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--mode", choices=["train", "inference", "both"], default="inference")
    p.add_argument("--n-samples", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--steps", type=int, default=None, help="cap training steps")
    p.add_argument("--checkpoint-path", type=str, default=None,
                   help="orbax dir or reference .ckpt file")
    p.add_argument("--adaptive", action="store_true",
                   help="use the adaptive dopri5 sampler (reference parity)")
    p.add_argument("--save-images", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--save-trajectories", action=argparse.BooleanOptionalAction, default=False)
    p.add_argument("--root-dir", type=str, default=os.path.dirname(os.path.abspath(__file__)))
    p.add_argument("--preset", choices=["flagship", "tiny"], default="flagship",
                   help="tiny = 8^3 smoke config for CI/CPU")
    p.add_argument("--train-devices", type=str, default="auto",
                   help="'cpu', 'auto' (all devices), or a count/comma list "
                        "like '0,1' (reference --train-devices parity)")
    p.add_argument("--infer-device", type=str, default="auto",
                   choices=["auto", "cpu"],
                   help="'cpu' forces the CPU platform for --mode inference "
                        "(reference --infer-device parity; JAX's platform is "
                        "process-wide, so it is ignored for --mode both)")
    p.add_argument("--wandb", action="store_true", help="log metrics+images to wandb")
    p.add_argument("--pretrain-smoke", action=argparse.BooleanOptionalAction, default=True,
                   help="run the reference's pre-training data-inspection + "
                        "manual-inference checks (model_train_inference.py:540-542)")
    return p.parse_args()


def resolve_devices(spec: str):
    """Reference ``_parse_devices_arg`` analogue (``model_train_inference.py:129-171``):
    'cpu' forces the CPU platform, 'auto' uses every visible device, and a
    comma list/index selects that many mesh devices."""
    import jax as _jax

    s = (spec or "auto").strip().lower()
    if s == "cpu":
        _jax.config.update("jax_platforms", "cpu")
        return _jax.devices()
    devices = _jax.devices()
    if s == "auto":
        return devices
    idxs = [int(x) for x in s.split(",")]
    if max(idxs) >= len(devices):
        raise ValueError(f"device indices {idxs} out of range for {len(devices)} devices")
    return [devices[i] for i in idxs]


def main():
    args = parse_arguments()
    # multi-host (pod) wiring — must run before anything touches the XLA
    # backend; no-op without coordinator/SLURM configuration (README runbook)
    from flowtrain_stochastic_interpolation_tpu.parallel import maybe_initialize

    maybe_initialize()
    force_cpu = (
        (args.train_devices or "").strip().lower() == "cpu"
        if args.mode in ("train", "both")
        else args.infer_device == "cpu"
    )
    if force_cpu:
        # force the platform BEFORE the first jax.devices() call: once the
        # TPU backend initialises, 'cpu' can no longer exclude it, and on
        # the axon tunnel even backend init blocks on the remote grant
        jax.config.update("jax_platforms", "cpu")
    config = unconditional_64() if args.preset == "flagship" else tiny_test()
    dirs = setup_directories(args.root_dir, config.name)
    print(f"mode={args.mode} devices={jax.devices()}")

    if args.mode in ("train", "both"):
        from flowtrain_stochastic_interpolation_tpu.parallel import create_mesh
        from flowtrain_stochastic_interpolation_tpu.train.callbacks import (
            InferenceCallback,
        )

        mesh = create_mesh(devices=resolve_devices(args.train_devices))
        writer = MetricsWriter(dirs["metrics_dir"], use_wandb=args.wandb)
        callback = InferenceCallback(
            config, build_model(config), dirs["photo_dir"],
            every_n_epochs=config.training.inference_every_epochs,
            writer=writer,
        )
        result = train(
            config, num_steps=args.steps, mesh=mesh,
            checkpoint_dir=dirs["checkpoint_dir"], writer=writer,
            callback=callback, pretrain_smoke=args.pretrain_smoke,
        )
        writer.close()
        print(f"training: {result.steps_per_sec:.3f} steps/s, "
              f"final loss {result.history[-1]['train_loss']:.4f}")

    if args.mode in ("inference", "both"):
        run_inference(args, config, dirs)


if __name__ == "__main__":
    main()
