"""Flagship training demonstration on real hardware (uncond + conditional).

Runs N real train steps of the 64³ recipe, logs the loss curve to CSV,
checkpoints, then samples from the trained weights — producing end-to-end
evidence that the full pipeline trains on TPU.

* default: unconditional recipe (batch 4, accum 1) — mirrors the reference
  ``model_train_inference.py --mode train`` loop.
* ``--conditional``: conditional recipe (batch 2 through this environment's
  compile tunnel; accumulation recovers the effective batch) with on-device
  borehole/surface masks, AdamW + EMA, ending in a conditional ensemble
  sampled from a held-out scenario (reference
  ``model_train_sh_inference_cond.py:401-467`` + ensemble flow).
* ``--shape N``: train at N³ voxels instead of 64³.  The UNet is fully
  convolutional (weights are resolution-independent), so combined with
  ``--init-from`` this fine-tunes 64³-trained weights at a resolution the
  reference never trains (its production size is fixed at 64³,
  ``model_train_inference.py:61-66``) — beyond-reference-scale training on
  one chip.
* ``--init-from DIR``: warm-start params (+EMA shadow) from another run's
  orbax checkpoint dir; optimizer state and step counter start fresh.
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

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--conditional", action="store_true")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--lr", type=float, default=None,
                   help="override learning rate (e.g. batch-scaled: the "
                        "conditional recipe's 1e-3 targets effective batch "
                        "32; at effective batch 8 it diverges — measured)")
    p.add_argument("--out", default=None)
    p.add_argument("--resume", action="store_true",
                   help="restore from <out>/ckpt and continue up to --steps "
                        "(real resume through the orbax CheckpointManager)")
    p.add_argument("--shape", type=int, default=None,
                   help="cubic volume edge length (default: the preset's — "
                        "64 for flagship; the UNet is fully convolutional so "
                        "any multiple of its downsample factor works)")
    p.add_argument("--init-from", default=None,
                   help="warm-start params/EMA from another run's orbax ckpt "
                        "dir (e.g. artifacts/train_demo/ckpt); fresh "
                        "optimizer state, step counter reset to 0")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the forward in the backward (fit "
                        "larger volumes/batches in HBM)")
    p.add_argument("--remat-policy", default=None,
                   choices=["dots", "nothing"],
                   help="what the checkpointed forward keeps (see "
                        "TrainingConfig.remat_policy; 'nothing' is the "
                        "minimum-HBM form that fits 128³ b1 on one chip)")
    p.add_argument("--objective-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="storage dtype of the objective volume tensors "
                        "(TrainingConfig.objective_dtype); bfloat16 halves "
                        "every [B,X,Y,Z,E] buffer")
    p.add_argument("--attn-vjp", default=None,
                   choices=["closed_form", "closed_form_bf16", "chunked",
                            "autodiff"],
                   help="folded-linear-attention backward (ModelConfig."
                        "attn_folded_vjp). closed_form auto-chunks at >=2^20 "
                        "rows; 'chunked' forces the row-blocked form "
                        "(chunk-bounded memory — the 128³ training choice)")
    p.add_argument("--remat-blocks", action="store_true",
                   help="per-block jax.checkpoint inside the UNet "
                        "(ModelConfig.remat_blocks): bounds backward "
                        "activation liveness to one block — the form that "
                        "fits 128³ b1 training on one chip")
    p.add_argument("--no-ema", action="store_true",
                   help="drop the EMA shadow tree (frees ~92 MB at flagship "
                        "scale — the last squeeze that fits 128³ b1 training "
                        "on one 16 GB chip)")
    p.add_argument("--preset", default="flagship",
                   choices=["flagship", "tiny"],
                   help="tiny = 8³/dim-8 smoke config (CPU-friendly drive "
                        "of the demo tool itself)")
    args = p.parse_args()
    if args.batch_size is None:
        args.batch_size = 2 if args.conditional else 4
    if args.out is None:
        args.out = "/root/repo/artifacts/train_demo" + ("_cond" if args.conditional else "")
    os.makedirs(args.out, exist_ok=True)

    from flowtrain_stochastic_interpolation_tpu.config import (
        conditional_64,
        tiny_test,
        unconditional_64,
    )
    from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
        synthetic_geology_batch,
    )
    from flowtrain_stochastic_interpolation_tpu.inference import (
        build_atb,
        sample_conditional,
        sample_unconditional,
    )
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
    from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step
    from flowtrain_stochastic_interpolation_tpu.utils.logging import MetricsWriter

    if args.preset == "tiny":
        config = tiny_test(conditional=args.conditional)
    else:
        config = conditional_64() if args.conditional else unconditional_64()
    training_overrides = {"accumulate_grad_batches": args.accum}
    if args.lr is not None:
        training_overrides["learning_rate"] = args.lr
    if args.remat:
        training_overrides["remat"] = True
    if args.remat_policy is not None:
        training_overrides["remat_policy"] = args.remat_policy
    if args.objective_dtype is not None:
        training_overrides["objective_dtype"] = args.objective_dtype
    data_overrides = {"batch_size": args.batch_size}
    if args.shape is not None:
        data_overrides["shape"] = (args.shape, args.shape, args.shape)
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, **data_overrides),
        training=dataclasses.replace(config.training, **training_overrides),
    )
    if args.no_ema:
        config = dataclasses.replace(
            config, ema=dataclasses.replace(config.ema, enabled=False)
        )
    model_overrides = {}
    if args.attn_vjp is not None:
        model_overrides["attn_folded_vjp"] = args.attn_vjp
    if args.remat_blocks:
        model_overrides["remat_blocks"] = True
    if model_overrides:
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, **model_overrides)
        )
    args.shape = config.data.shape[0]
    init_cfg = config
    if args.shape > 64:
        # params are resolution-independent (fully-convolutional UNet);
        # init at 64³ keeps the one-off model.init cheap — a 128³ float32
        # init forward would burn HBM + a long remote compile for nothing
        init_cfg = dataclasses.replace(
            config, data=dataclasses.replace(config.data, shape=(64, 64, 64))
        )
    model, tx, state = init_train_state(init_cfg, host_init=True)
    if args.init_from:
        # params/EMA transfer across resolutions (fully-convolutional UNet)
        from flowtrain_stochastic_interpolation_tpu.models.persistence import (
            is_release_weights_dir,
            load_release_weights,
        )

        if is_release_weights_dir(args.init_from):
            tree, _, meta = load_release_weights(args.init_from)
            # warm-start from the source run's EMA when available: it is the
            # weight set the source samples with (reference applies EMA at
            # train end, cond callbacks.py:270-274)
            start = tree.get("ema_params") or tree["params"]
            ema = None if state.ema_params is None else start
            state = state.replace(params=start, ema_params=ema)
            src_step = meta.get("step")
        else:
            # the current state is the restore template — same pytree
            # structure regardless of config.data.shape
            src = CheckpointManager(args.init_from)
            try:
                restored = src.restore(state)
            except Exception:
                # opt_state structure differs (e.g. different accumulation)
                # — rebuild a template from the source run's own config
                src_cfg = src.load_config()
                assert src_cfg is not None, (
                    f"{args.init_from} has neither weights.msgpack nor a "
                    "restorable orbax checkpoint with config.json")
                _, _, src_state = init_train_state(src_cfg, host_init=True)
                restored = src.restore(src_state)
            state = state.replace(params=restored.params,
                                  ema_params=restored.ema_params)
            src.close()
            src_step = int(restored.step)
        print(f"warm-started from {args.init_from} (step {src_step})",
              flush=True)
    train_step = make_train_step(model, tx, config)
    writer = MetricsWriter(args.out)
    key = jax.random.PRNGKey(7)

    mgr = CheckpointManager(os.path.join(args.out, "ckpt"), config)
    start_step = 0
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}", flush=True)

    t_start = time.perf_counter()
    losses = []
    for step in range(start_step, args.steps):
        batch = synthetic_geology_batch(
            jax.random.fold_in(key, step), args.batch_size, config.data.shape
        )
        state, metrics = train_step(state, batch, key)
        if step % 10 == 0 or step == args.steps - 1:
            loss = float(metrics["train_loss"])  # true device fence
            losses.append(loss)
            row = {"train_loss": loss, "grad_norm": float(metrics["grad_norm"])}
            if args.conditional:
                row["flow_loss"] = float(metrics["flow_loss"])
                row["reconstruct_loss"] = float(metrics["reconstruct_loss"])
            writer.write(step, row)
            if step % 100 == 0:
                print(f"step {step}: loss {loss:.4f} "
                      f"({(time.perf_counter() - t_start):.0f}s elapsed)", flush=True)
    writer.close()
    elapsed = time.perf_counter() - t_start

    if losses:  # no-op when resumed at/after --steps (sampling-only rerun)
        mgr.save(args.steps, state, metrics={"train_loss": losses[-1]})
        mgr.wait()

    # sample from the trained weights (EMA when present — reference applies
    # EMA at train end, cond callbacks.py:270-274)
    params = state.ema_params if state.ema_params is not None else state.params
    variables = {"params": params}
    if state.constants.get("model"):
        variables["constants"] = state.constants["model"]
    table = state.constants["embedding"]

    summary = {
        "conditional": args.conditional,
        "steps": args.steps,
        "batch": args.batch_size,
        "accum": args.accum,
        "elapsed_s": round(elapsed, 1),
        "loss_first": round(losses[0], 4) if losses else None,
        "loss_last": round(float(np.mean(losses[-5:])), 4) if losses else None,
    }

    if args.conditional:
        from flowtrain_stochastic_interpolation_tpu.ops.masks import make_combined_mask

        # held-out scenario: true volume + combined observation mask
        true = synthetic_geology_batch(jax.random.PRNGKey(999), 1, config.data.shape)[0]
        mask = make_combined_mask(jax.random.PRNGKey(998), true[None])[0]
        atb = build_atb(true, mask, table)
        result = sample_conditional(
            model, variables, table, atb,
            n_samples=4, batch_size=4, seed=42,
            t0=config.inference.t0, tf=config.inference.tf,
            n_frames=config.inference.n_frames,
            substeps=config.inference.substeps, method="rk4", verbose=False,
        )
        dec = result.decoded - 1
        np.save(os.path.join(args.out, "true_model.npy"), np.asarray(true, np.int8))
        for i in range(dec.shape[0]):
            np.save(os.path.join(args.out, f"sol_{i}.npy"), dec[i].astype(np.int8))
        m = np.asarray(mask)
        obs_acc = float(((dec == np.asarray(true)[None]) * m[None]).sum()
                        / max(m.sum() * dec.shape[0], 1))
        summary.update({
            "observed_voxel_accuracy": round(obs_acc, 3),
            "ensemble_agreement": round(float((dec[0] == dec[1]).mean()), 3),
        })
    else:
        big = args.shape > 64
        result = sample_unconditional(
            model, variables, table,
            n_samples=2 if big else 8, batch_size=1 if big else 8,
            data_shape=config.data.shape,
            embedding_dim=config.data.embedding_dim, seed=100,
            t0=0.001, tf=1.0, n_frames=16, substeps=2, method="rk4",
            with_prominence=True, verbose=False,
            # >64³: bf16 state + one jitted dispatch per saved frame — the
            # fused single dispatch exceeds this runtime's ~60 s ceiling
            # (BASELINE.md 128³ diagnosis)
            state_dtype=jnp.bfloat16 if big else jnp.float32,
            **({"frame_dispatch": True} if big else {}),
        )
        for i in range(min(4, result.decoded.shape[0])):
            np.save(os.path.join(args.out, f"sample_{i}.npy"),
                    (result.decoded[i] - 1).astype(np.int8))
        dec = result.decoded - 1
        summary.update({
            "air_frac_top": round(float((dec[..., -8:] == -1).mean()), 3),
            "air_frac_bottom": round(float((dec[..., :8] == -1).mean()), 3),
            "prominence_mean": round(float(result.prominence.mean()), 4),
        })

    try:
        from flowtrain_stochastic_interpolation_tpu.utils.plotting import plot_2d_slices
        first = (result.decoded[0] - 1)
        plot_2d_slices(first, save_path=os.path.join(args.out, "sample_0_slices.png"))
    except Exception as exc:
        print("plot failed:", exc)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
