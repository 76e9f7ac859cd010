"""Host-side training loop: data feed, metrics, checkpoints, periodic sampling.

The Lightning ``Trainer`` replacement (reference stack 3.1 in SURVEY.md):
resume-from-latest, per-step metric logging (CSV + optional wandb), periodic
in-training inference with prominence uncertainty maps
(``callbacks.py:48-169``), and orbax checkpointing of
``{params, ema_params, opt_state, step}``.

The hot path stays entirely on device: the synthetic data source generates
batches in HBM and the jitted ``train_step`` is the only dispatch per step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.data.geogen import get_dataset
from flowtrain_stochastic_interpolation_tpu.models import UNet3D, UNet3DCond
from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding
from flowtrain_stochastic_interpolation_tpu.parallel import (
    create_mesh,
    is_primary,
    shard_batch,
)
from flowtrain_stochastic_interpolation_tpu.train.checkpoint import CheckpointManager
from flowtrain_stochastic_interpolation_tpu.train.state import (
    TrainState,
    init_state,
    make_optimizer,
)
from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step
from flowtrain_stochastic_interpolation_tpu.utils.logging import MetricsWriter


def build_model(config: ExperimentConfig, spatial_axis=None):
    """Instantiate the configured UNet (conditional or not).

    ``spatial_axis``: mesh axis name for explicit X-sharded execution under
    ``shard_map`` (``parallel/spatial.py``); None for the single-device /
    GSPMD-annotation paths.
    """
    mc = config.model
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(mc.dtype, None)
    common = dict(
        dim=mc.dim,
        dim_mults=tuple(mc.dim_mults),
        data_channels=config.data.embedding_dim,
        dropout=mc.dropout,
        self_condition=mc.self_condition,
        time_resolution=mc.time_resolution,
        time_sin_pos=mc.time_sin_pos,
        time_bandwidth=mc.time_bandwidth,
        time_learned_emb=mc.time_learned_emb,
        attn_enabled=mc.attn_enabled,
        attn_dim_head=mc.attn_dim_head,
        attn_heads=mc.attn_heads,
        full_attn=mc.full_attn,
        flash_attn=mc.flash_attn,
        fused_folded_attn=mc.fused_folded_attn,
        folded_attn_vjp=mc.attn_folded_vjp,
        remat_blocks=mc.remat_blocks,
        dtype=dtype,
    )
    if mc.conditional:
        return UNet3DCond(**common, variant=mc.cond_variant, spatial_axis=spatial_axis)
    return UNet3D(**common, spatial_axis=spatial_axis)


def init_model_variables(config: ExperimentConfig, key=None,
                         host: bool = False):
    """Draw the configured UNet's init variables.

    ``host=True`` initializes eagerly on the host CPU at the smallest
    spatial shape the down path supports and ``device_put``s the result to
    the default device.  The UNet is fully convolutional — every parameter
    shape is independent of batch and spatial extent (the 128³-from-64³
    sampling record relies on the same property) — so the tiny-shape trace
    creates the identical variable tree while skipping the full-resolution
    ``model.init`` program, which costs a ~450 s remote compile on the axon
    tunnel (BENCH_r04 tail: two such compiles, sampler + train).  The host
    trace uses the Pallas-free attention variant (`fused_folded_attn=False`;
    same parameter tree — flax param RNG is path/name-keyed and both
    branches declare the same params) because ``jax.default_backend()``
    still reports "tpu" inside a ``default_device(cpu)`` scope.
    """
    if key is None:
        key = jax.random.PRNGKey(config.training.seed)
    e = config.data.embedding_dim
    if not host:
        model = build_model(config)
        x = jnp.zeros((1, *config.data.shape, e), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        if config.model.conditional:
            return model.init(key, x, x, t)
        return model.init(key, x, t)

    import dataclasses as _dc

    host_config = _dc.replace(
        config,
        model=_dc.replace(config.model, fused_folded_attn=False,
                          flash_attn=False),
    )
    model = build_model(host_config)
    side = 2 ** (len(config.model.dim_mults) - 1)
    shape = tuple(min(side, s) for s in config.data.shape)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x = jnp.zeros((1, *shape, e), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        if config.model.conditional:
            variables = model.init(key, x, x, t)
        else:
            variables = model.init(key, x, t)
    return jax.device_put(variables, jax.devices()[0])


def init_train_state(config: ExperimentConfig, mesh=None,
                     host_init: bool = False) -> tuple:
    """Build (model, tx, state) with params replicated over the mesh.

    ``host_init=True`` draws the parameters on the host CPU at a reduced
    spatial shape (see :func:`init_model_variables`) — the fast path for
    benches/tools on the remote-TPU tunnel, where full-shape ``model.init``
    is a multi-minute compile.
    """
    model = build_model(config)
    variables = init_model_variables(config, host=host_init)

    table = jnp.asarray(
        simplex_embedding(config.data.num_categories, config.data.embedding_dim)
    )
    constants = {
        "embedding": table,
        "model": dict(variables.get("constants", {})),
    }

    updates_per_epoch = max(
        config.data.epoch_size
        // config.data.batch_size
        // config.training.accumulate_grad_batches,
        1,
    )
    tx = make_optimizer(config.training, updates_per_epoch)
    state = init_state(variables["params"], constants, tx, config.ema)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
    return model, tx, state


@dataclass
class TrainResult:
    state: TrainState
    history: list = field(default_factory=list)
    steps_per_sec: float = 0.0  # steady-state: excludes the first (compile) step
    steps_per_sec_with_compile: float = 0.0


def train(
    config: ExperimentConfig,
    *,
    num_steps: Optional[int] = None,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    writer: Optional[MetricsWriter] = None,
    callback: Optional[Callable[[int, TrainState, Dict[str, float]], None]] = None,
    state: Optional[TrainState] = None,
    pretrain_smoke: bool = False,
) -> TrainResult:
    """Run training for ``num_steps`` micro-batches (or config epochs).

    Resumes from the latest checkpoint in ``checkpoint_dir`` when present
    (reference ``launch_training`` resume semantics,
    ``model_train_inference.py:499-515``).

    ``pretrain_smoke=True`` runs the reference's pre-training functional
    checks before step 0 (``model_train_inference.py:540-542``): render the
    first data batch (``test_inspect_data`` analogue) and exercise one full
    sampling pass through the callback (``run_manual_inference`` analogue).
    """
    if mesh is None:
        mesh = create_mesh()
    model, tx, fresh_state = init_train_state(config, mesh)
    if state is None:
        state = fresh_state

    mgr = None
    if checkpoint_dir:
        mgr = CheckpointManager(
            checkpoint_dir, config, max_to_keep=config.training.keep_checkpoints
        )
        if config.resume and mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"[train] resumed from step {int(state.step)}")

    train_step = make_train_step(model, tx, config)
    dataset = get_dataset(config.data, seed=config.training.seed)
    key = jax.random.PRNGKey(config.training.seed + 17)

    batch_size = config.data.batch_size
    steps_per_epoch = max(config.data.epoch_size // batch_size, 1)
    total_steps = (
        num_steps
        if num_steps is not None
        else steps_per_epoch * config.training.max_epochs
    )

    if pretrain_smoke:
        _pretrain_smoke(config, dataset, callback, state, checkpoint_dir)

    history = []
    start_step = int(state.step)
    t_start = time.perf_counter()
    t_after_first = None  # set after step 1 completes: excludes compile
    step = start_step
    epoch = start_step // steps_per_epoch

    def device_batches(epoch_idx):
        """Generate + place batches one step ahead of the consumer.

        For HOST-side sources (GeoGen/numpy: ``dataset.host_side``) a
        prefetch thread overlaps generation and the host→device transfer
        with the in-flight train step (the reference gets the same overlap
        from DataLoader workers).  Device-generated sources (synthetic) are
        already async device work — threading them adds nothing and
        cross-thread dispatch can wedge the single-session axon TPU client
        (observed: tiny CLI train stalled >14 min), so they stay inline.
        """
        def put_all():
            for b in dataset.batches(batch_size, epoch=epoch_idx):
                yield shard_batch(jnp.asarray(b), mesh)

        if getattr(dataset, "host_side", True):
            from flowtrain_stochastic_interpolation_tpu.data.prefetch import prefetch

            return prefetch(put_all(), depth=2)
        return put_all()

    batch_iter = device_batches(epoch)

    while step < start_step + total_steps:
        try:
            batch = next(batch_iter)
        except StopIteration:
            epoch += 1
            batch_iter = device_batches(epoch)
            continue
        state, metrics = train_step(state, batch, key)
        step += 1
        if t_after_first is None:
            jax.block_until_ready(metrics)  # fence out trace+compile time
            t_after_first = time.perf_counter()

        # Epoch boundaries fire the callback regardless of log_every_n_steps
        # (the reference's InferenceCallback is epoch-driven; coupling it to
        # the metric cadence silently disabled it for some settings).
        at_epoch_boundary = step % steps_per_epoch == 0
        if (
            step % config.training.log_every_n_steps == 0
            or at_epoch_boundary
            or step == start_step + total_steps
        ):
            host_metrics = {k: float(v) for k, v in metrics.items()}
            host_metrics["step"] = step
            history.append(host_metrics)
            # host-side artifacts are primary-process-only under multi-host
            # (jax.distributed); orbax saves below run on EVERY process —
            # checkpoints are coordinated internally and a primary-only call
            # would deadlock the rest (parallel/distributed.py::is_primary).
            if writer and is_primary():
                writer.write(step, host_metrics)
            if callback and is_primary():
                callback(step, state, host_metrics)

        if mgr and step % config.training.checkpoint_every_steps == 0:
            mgr.save(step, state, metrics={"train_loss": float(metrics["train_loss"])})

    # Block for an honest timing figure.  The scalar readback is the real
    # fence: bare block_until_ready has been observed returning at launch on
    # the axon tunnel platform (BASELINE.md packed-conv 2b measurement note).
    jax.block_until_ready(state.params)
    float(jnp.asarray(jax.tree.leaves(state.params)[0]).ravel()[0])
    t_end = time.perf_counter()
    if mgr:
        mgr.save(step, state, metrics={"train_loss": history[-1]["train_loss"] if history else 0.0})
        mgr.wait()
        mgr.close()

    n_steps_run = step - start_step
    steady = (
        (n_steps_run - 1) / max(t_end - t_after_first, 1e-9)
        if (t_after_first is not None and n_steps_run > 1)
        else n_steps_run / max(t_end - t_start, 1e-9)
    )
    return TrainResult(
        state=state,
        history=history,
        steps_per_sec=steady,
        steps_per_sec_with_compile=n_steps_run / max(t_end - t_start, 1e-9),
    )


def _pretrain_smoke(config, dataset, callback, state, checkpoint_dir) -> None:
    """Pre-training functional checks (ref ``model_train_inference.py:540-542``).

    1. ``test_inspect_data``: pull one batch and render slice grids of the
       first sample (``model_train_inference.py:714-723``).
    2. ``run_manual_inference``: one full sampling pass through the inference
       callback before any training (``callbacks.py:175-183``).
    """
    import os

    out_dir = checkpoint_dir or "."
    try:
        batch = np.asarray(next(dataset.batches(min(config.data.batch_size, 2), epoch=0)))
        from flowtrain_stochastic_interpolation_tpu.utils.plotting import plot_2d_slices

        os.makedirs(out_dir, exist_ok=True)
        plot_2d_slices(batch[0], save_path=os.path.join(out_dir, "inspect_data.png"))
        print(f"[train] pre-train data inspection saved ({out_dir}/inspect_data.png)")
    except Exception as exc:
        print(f"[train] pre-train data inspection failed: {exc}")
    if callback is not None and hasattr(callback, "run_inference"):
        try:
            callback.run_inference(state, tag="pretrain")
        except Exception as exc:
            print(f"[train] pre-train manual inference failed: {exc}")
