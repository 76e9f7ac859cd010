"""Conditional inference experiments: scenarios → ensembles → statistics.

TPU-native rebuild of
``/root/reference/project/geodata-3d-conditional/model_inference_experiments.py``:

1. ``create-data``: generate scenario volumes, build combined borehole/surface
   masks, save true model + observed boreholes (unobserved = air sentinel -1)
   (ref ``create_cond_data`` :146-168);
2. ``populate``: for each scenario, rebuild the mask
   ``(boreholes != -1) | (true == -1)`` and ``ATb = embed(true) * mask``, then
   generate an ensemble of conditional samples with per-batch seeds 42+i
   (ref ``populate_solutions`` :246-317);
3. ``analyze``: one-hot vote → per-voxel probabilities → entropy + most
   probable model + per-category (dike) probability maps
   (ref ``ensemble_analysis`` :426-480).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import conditional_64, tiny_test
from flowtrain_stochastic_interpolation_tpu.data.geogen import get_dataset
from flowtrain_stochastic_interpolation_tpu.inference import (
    build_atb,
    sample_conditional,
)
from flowtrain_stochastic_interpolation_tpu.ops import ensemble as ens
from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding
from flowtrain_stochastic_interpolation_tpu.ops.masks import make_combined_mask
from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
from flowtrain_stochastic_interpolation_tpu.train.loop import (
    build_model,
    init_train_state,
)


def create_cond_data(save_dir: str, n_scenarios: int, config, seed: int = 0) -> None:
    """Scenario data: true volume + observed boreholes (ref :146-168)."""
    dataset = get_dataset(config.data, seed=seed)
    for s in range(n_scenarios):
        folder = os.path.join(save_dir, f"scenario_{s}")
        os.makedirs(folder, exist_ok=True)
        true = jnp.asarray(dataset[s])  # [X, Y, Z] int
        mask = make_combined_mask(jax.random.PRNGKey(seed + s), true[None])[0]
        boreholes = jnp.where(mask, true, -1)  # unobserved -> air sentinel
        np.save(os.path.join(folder, "true_model.npy"), np.asarray(true, np.int8))
        np.save(os.path.join(folder, "boreholes.npy"), np.asarray(boreholes, np.int8))
        print(f"scenario {s}: observed {float(mask.mean()):.3%} of voxels")


COND_WEIGHTS_URL = (
    "https://github.com/chipnbits/flowtrain_stochastic_interpolation/releases/"
    "download/v1.0.0/conditional-weights.ckpt"
)


def load_model_with_ema_option(config, checkpoint_path, use_ema: bool,
                               auto_download_dir: str | None = None):
    """Model + variables + table, EMA weights optional (ref :387-403).

    With no ``checkpoint_path`` and an ``auto_download_dir``, fetches the
    released ``conditional-weights.ckpt`` (reference ``main`` :551-557);
    falls back to random init in zero-egress environments."""
    model = build_model(config)
    if not checkpoint_path and auto_download_dir:
        from flowtrain_stochastic_interpolation_tpu.utils.io import download_if_missing

        demo_ckpt = os.path.join(auto_download_dir, "conditional-weights.ckpt")
        if download_if_missing(demo_ckpt, COND_WEIGHTS_URL):
            checkpoint_path = demo_ckpt
    if checkpoint_path and str(checkpoint_path).endswith(".ckpt"):
        from flowtrain_stochastic_interpolation_tpu.models.persistence import (
            convert_lightning_module,
            load_lightning_checkpoint,
        )

        ckpt = load_lightning_checkpoint(checkpoint_path)
        conv = convert_lightning_module(ckpt, conditional=True, use_ema=use_ema)
        variables = {"params": conv["params"]}
        if conv.get("constants"):  # frozen RandomFourier freqs/phases
            variables["constants"] = conv["constants"]
        return model, variables, jnp.asarray(conv["embedding"])

    from flowtrain_stochastic_interpolation_tpu.models.persistence import (
        is_release_weights_dir,
        load_release_weights,
    )

    if checkpoint_path and is_release_weights_dir(checkpoint_path):
        tree, _, meta = load_release_weights(checkpoint_path)
        params = tree["params"]
        if use_ema and tree.get("ema_params"):
            params = tree["ema_params"]
        variables = {"params": params}
        if tree.get("constants"):
            variables["constants"] = tree["constants"]
        from flowtrain_stochastic_interpolation_tpu.ops.embedding import (
            simplex_embedding,
        )

        table = jnp.asarray(
            simplex_embedding(config.data.num_categories, config.data.embedding_dim)
        )
        print(f"loaded release weights step {meta.get('step')}")
        return model, variables, table

    _, _, state = init_train_state(config, host_init=True)
    table = state.constants["embedding"]
    if checkpoint_path:
        mgr = CheckpointManager(checkpoint_path, None)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"loaded step {mgr.latest_step()}")
            table = state.constants["embedding"]
        else:
            print("WARNING: no checkpoint found — random init")
    params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
    variables = {"params": params}
    if state.constants.get("model"):
        variables["constants"] = state.constants["model"]
    return model, variables, table


def populate_solutions(save_dir, model, variables, table, config, args) -> None:
    """Ensemble sampling per scenario (ref :246-317).

    One compiled sampler (ATb as a runtime argument) serves every scenario —
    a per-scenario closure would re-trace per folder."""
    ic = config.inference
    from flowtrain_stochastic_interpolation_tpu.inference import make_sampler

    sampler = make_sampler(
        model, variables, table, conditional=True,
        t0=ic.t0, tf=ic.tf, n_frames=ic.n_frames,
        substeps=ic.substeps, method=ic.method,
        sde_epsilon=getattr(args, "sde_epsilon", 0.5),
    )
    for folder in sorted(os.listdir(save_dir)):
        path = os.path.join(save_dir, folder)
        if not os.path.isdir(path) or not folder.startswith("scenario"):
            continue
        true = jnp.asarray(np.load(os.path.join(path, "true_model.npy")), jnp.int32)
        boreholes = jnp.asarray(np.load(os.path.join(path, "boreholes.npy")), jnp.int32)
        mask = (boreholes != -1) | (true == -1)  # ref :283
        atb = build_atb(true, mask, table)
        result = sample_conditional(
            model, variables, table, atb,
            n_samples=args.n_samples, batch_size=args.batch_size, seed=42,
            sampler=sampler,
            # method rides in kwargs so sample_conditional knows to thread a
            # diffusion key into an SDE sampler (the sampler itself is the
            # prebuilt one above)
            method=ic.method,
        )
        for i in range(result.decoded.shape[0]):
            np.save(
                os.path.join(path, f"sol_{i}.npy"),
                (result.decoded[i] - 1).astype(np.int8),  # ref decode−1 :310-317
            )
        print(f"{folder}: {args.n_samples} solutions "
              f"in {sum(result.seconds_per_batch):.1f}s")


def ensemble_analysis(save_dir: str, config, dike_category: int = 13) -> None:
    """Vote probabilities, entropy, most-probable model (ref :426-480)."""
    n_cats = config.data.num_categories
    for folder in sorted(os.listdir(save_dir)):
        path = os.path.join(save_dir, folder)
        if not os.path.isdir(path) or not folder.startswith("scenario"):
            continue
        sols = [
            np.load(os.path.join(path, f))
            for f in sorted(os.listdir(path))
            if f.startswith("sol_")
        ]
        if not sols:
            continue
        stack = jnp.asarray(np.stack(sols, axis=0), jnp.int32)
        probs = ens.vote_probabilities(stack, n_cats)
        np.save(os.path.join(path, "probability_tensor.npy"), np.asarray(probs))
        np.save(os.path.join(path, "entropy.npy"), np.asarray(ens.entropy(probs)))
        np.save(os.path.join(path, "entropy_air_masked.npy"),
                np.asarray(ens.air_masked_entropy(probs)))
        np.save(os.path.join(path, "most_probable.npy"),
                np.asarray(ens.most_probable_model(probs), np.int8))
        np.save(os.path.join(path, "dike_probability.npy"),
                np.asarray(ens.category_probability(probs, dike_category)))
        true = np.load(os.path.join(path, "true_model.npy"))
        acc = float((np.asarray(ens.most_probable_model(probs)) == true).mean())
        print(f"{folder}: ensemble={len(sols)}, voxel accuracy vs truth {acc:.3f}")


def main():
    p = argparse.ArgumentParser(description="Conditional ensemble experiments")
    p.add_argument("--stage", choices=["create-data", "populate", "analyze", "all"],
                   default="all")
    p.add_argument("--n-samples", type=int, default=8)
    p.add_argument("--n-scenarios", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--checkpoint-path", type=str, default=None)
    p.add_argument("--preset", choices=["flagship", "tiny"], default="flagship")
    p.add_argument("--save-dir", type=str,
                   default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "cond_experiments"))
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="'cpu' forces the CPU backend before XLA init "
                        "(CI / hosts without the TPU grant)")
    p.add_argument("--method", default=None,
                   choices=["euler", "heun", "midpoint", "rk4", "sde"],
                   help="override the recipe solver for the ensemble sweep "
                        "(BASELINE config 5 'SDE/ODE sweep'; 'sde' = "
                        "Euler–Maruyama with the velocity-recovered score)")
    p.add_argument("--sde-epsilon", type=float, default=0.5,
                   help="diffusion strength for --method sde (linear-decay "
                        "schedule)")
    args = p.parse_args()

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    config = conditional_64() if args.preset == "flagship" else tiny_test(conditional=True)
    if args.method is not None:
        import dataclasses

        config = dataclasses.replace(
            config,
            inference=dataclasses.replace(config.inference, method=args.method),
        )
    os.makedirs(args.save_dir, exist_ok=True)

    if args.stage in ("create-data", "all"):
        create_cond_data(args.save_dir, args.n_scenarios, config)
    if args.stage in ("populate", "all"):
        model, variables, table = load_model_with_ema_option(
            config, args.checkpoint_path, args.use_ema,
            auto_download_dir=args.save_dir if args.preset == "flagship" else None,
        )
        populate_solutions(args.save_dir, model, variables, table, config, args)
    if args.stage in ("analyze", "all"):
        ensemble_analysis(args.save_dir, config)


if __name__ == "__main__":
    main()
