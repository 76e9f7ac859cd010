"""End-to-end training smoke tests: 16³ tiny UNet, loss decreases, EMA,
checkpoint roundtrip, and 8-device data-parallel execution (BASELINE.json
config 2 analogue)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.config import (
    DataConfig,
    EMAConfig,
    ExperimentConfig,
    ModelConfig,
    TrainingConfig,
)
from flowtrain_stochastic_interpolation_tpu.data.synthetic import (
    synthetic_geology_batch,
)
from flowtrain_stochastic_interpolation_tpu.parallel import create_mesh, shard_batch
from flowtrain_stochastic_interpolation_tpu.train.loop import (
    init_train_state,
    train,
)
from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step
from flowtrain_stochastic_interpolation_tpu.train.state import make_optimizer


def tiny_config(conditional=False, **training_overrides) -> ExperimentConfig:
    kwargs = dict(
        learning_rate=2e-3,
        lr_decay=0.997,
        gradient_clip_val=1.0,
        accumulate_grad_batches=1,
        time_range=(0.001, 0.999),
        log_every_n_steps=1,
        checkpoint_every_steps=100,
    )
    kwargs.update(training_overrides)
    training = TrainingConfig(**kwargs)
    return ExperimentConfig(
        name="tiny-test",
        model=ModelConfig(
            dim=8,
            dim_mults=(1, 2),
            dropout=0.0,
            time_resolution=16,
            time_bandwidth=10.0,
            time_learned_emb=True,
            attn_dim_head=4,
            attn_heads=2,
            conditional=conditional,
            dtype="float32",
        ),
        data=DataConfig(
            shape=(8, 8, 8), batch_size=8, epoch_size=64, embedding_dim=15
        ),
        training=training,
        ema=EMAConfig(enabled=True, decay=0.9, start_step=0),
    )


def test_unconditional_loss_decreases():
    cfg = tiny_config()
    result = train(cfg, num_steps=30)
    losses = [h["train_loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
    assert result.steps_per_sec > 0


def test_conditional_loss_decreases():
    cfg = tiny_config(conditional=True)
    result = train(cfg, num_steps=30)
    losses = [h["train_loss"] for h in result.history]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # conditional metrics present (flow + reconstruct, ref :454-465)
    assert "flow_loss" in result.history[0] and "reconstruct_loss" in result.history[0]


def test_ema_tracks_params():
    cfg = tiny_config()
    mesh = create_mesh(1)
    model, tx, state = init_train_state(cfg, mesh)
    step_fn = make_train_step(model, tx, cfg)
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), 8, (8, 8, 8))
    key = jax.random.PRNGKey(1)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    for _ in range(3):
        state, _ = step_fn(state, batch, key)
    # EMA is a convex blend: strictly between old shadow and new params
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    assert not np.allclose(leaf(state.ema_params), leaf(state.params))
    assert not np.allclose(leaf(state.ema_params), leaf(p0))


def test_gradient_accumulation_runs():
    cfg = tiny_config(accumulate_grad_batches=4)
    result = train(cfg, num_steps=8)
    assert np.isfinite([h["train_loss"] for h in result.history]).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    result = train(cfg, num_steps=5, checkpoint_dir=str(tmp_path / "ckpt"))
    cfg2 = dataclasses.replace(cfg, resume=True)
    result2 = train(cfg2, num_steps=3, checkpoint_dir=str(tmp_path / "ckpt"))
    assert int(result2.state.step) == 8  # resumed from 5, ran 3 more


def test_data_parallel_8_devices():
    assert len(jax.devices()) == 8
    mesh = create_mesh(8)
    cfg = tiny_config()
    model, tx, state = init_train_state(cfg, mesh)
    step_fn = make_train_step(model, tx, cfg)
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), 8, (8, 8, 8))
    batch = shard_batch(batch, mesh)
    # batch axis sharded over 8 devices
    assert len(batch.sharding.device_set) == 8
    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, key)
    assert np.isfinite(float(metrics["train_loss"]))
    # params stay replicated
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.parametrize("save_atb", [True, False])
def test_remat_matches_no_remat(save_atb):
    """Rematerialised conditional step == plain step (losses + grad_norm).

    Covers the save-the-EmbedATb-towers policy (remat_save_atb) that keeps
    the k=5 conv recompute (and its 2.7×-padded lowering temp,
    docs/roofline.md) out of the backward program."""
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), 4, (8, 8, 8))
    key = jax.random.PRNGKey(1)

    metrics = {}
    for label, overrides in {
        "plain": dict(remat=False),
        "remat": dict(remat=True, remat_save_atb=save_atb),
        "remat_nothing": dict(
            remat=True, remat_save_atb=save_atb, remat_policy="nothing"
        ),
    }.items():
        cfg = tiny_config(conditional=True, **overrides)
        mesh = create_mesh(1)
        model, tx, state = init_train_state(cfg, mesh)
        step_fn = make_train_step(model, tx, cfg)
        _, m = step_fn(state, batch, key)
        metrics[label] = jax.tree.map(np.asarray, m)

    for variant in ("remat", "remat_nothing"):
        for k in metrics["plain"]:
            np.testing.assert_allclose(
                metrics[variant][k], metrics["plain"][k], rtol=1e-5, atol=1e-6,
                err_msg=f"{variant}:{k}",
            )


def test_cross_resolution_warm_start(tmp_path):
    """Params trained at 8³ restore into a 16³ run and train (fine-tune).

    The UNet is fully convolutional, so weight pytrees are
    resolution-independent; this pins the ``train_demo --shape/--init-from``
    path (beyond-reference-scale fine-tuning — the reference trains only at
    its fixed 64³ production size, ``model_train_inference.py:61-66``)."""
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import (
        CheckpointManager,
    )

    cfg8 = tiny_config()
    result = train(cfg8, num_steps=3, checkpoint_dir=str(tmp_path / "ckpt"))

    cfg16 = dataclasses.replace(
        cfg8, data=dataclasses.replace(cfg8.data, shape=(16, 16, 16))
    )
    model, tx, state = init_train_state(cfg16)
    src = CheckpointManager(str(tmp_path / "ckpt"))
    restored = src.restore(state)  # 16³ state is a valid template: same tree
    src.close()
    state = state.replace(params=restored.params, ema_params=restored.ema_params)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(result.state.params)[0]),
    )
    assert int(state.step) == 0  # fresh counter: fine-tune, not resume

    step_fn = make_train_step(model, tx, cfg16)
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), 2, (16, 16, 16))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))


def test_release_weights_roundtrip(tmp_path):
    """Orbax ckpt → compact release dir → sampling/fine-tune reload.

    The release format (bf16 msgpack + config + meta) is what trained demo
    weights are committed as — the analogue of the reference's GitHub-release
    ``.ckpt`` distribution (``readme.md:27-33``)."""
    from flowtrain_stochastic_interpolation_tpu.models.persistence import (
        is_release_weights_dir,
        load_release_weights,
        save_release_weights,
    )

    cfg = tiny_config()
    result = train(cfg, num_steps=3, checkpoint_dir=str(tmp_path / "ckpt"))
    rel = str(tmp_path / "release")
    save_release_weights(
        rel,
        params=result.state.params,
        ema_params=result.state.ema_params,
        model_constants=result.state.constants.get("model", {}),
        config_json=cfg.to_json(),
        step=int(result.state.step),
    )
    assert is_release_weights_dir(rel)

    tree, config2, meta = load_release_weights(rel)
    assert meta["step"] == 3 and config2.model.dim == cfg.model.dim
    # bf16 cast round-trip: within one bf16 ulp of the trained f32 params
    for orig, back in zip(
        jax.tree.leaves(result.state.params), jax.tree.leaves(tree["params"])
    ):
        assert back.dtype == np.float32  # cast back to master dtype on load
        np.testing.assert_allclose(np.asarray(orig), back, rtol=8e-3, atol=1e-6)
    # EMA present and distinct
    assert jax.tree.leaves(tree["ema_params"])


@pytest.mark.parametrize("conditional", [False, True])
def test_bf16_objective_close_to_f32(conditional):
    """objective_dtype='bfloat16' matches the f32 objective to bf16 tolerance.

    The bf16 pipeline (storage-halved X0/X1/XT/VT, f32 T and f32 loss
    reductions) is the memory margin for 128³ single-chip training; this
    pins that it computes the *same* objective, not a different one."""
    batch = synthetic_geology_batch(jax.random.PRNGKey(0), 4, (8, 8, 8))
    key = jax.random.PRNGKey(1)

    out = {}
    for label, overrides in {
        "f32": {}, "bf16": dict(objective_dtype="bfloat16"),
    }.items():
        cfg = tiny_config(conditional=conditional, **overrides)
        model, tx, state = init_train_state(cfg)
        step_fn = make_train_step(model, tx, cfg)
        _, m = step_fn(state, batch, key)
        out[label] = jax.tree.map(np.asarray, m)

    for k in out["f32"]:
        np.testing.assert_allclose(
            out["bf16"][k], out["f32"][k], rtol=0.1, err_msg=k
        )


def test_remat_blocks_matches_plain():
    """Per-block remat (UNet.remat_blocks) == plain model: identical param
    tree (nn.remat preserves naming → converter/checkpoint compatible),
    identical loss, grads equal to recompute-reassociation tolerance, and
    the dropout path traces (deterministic is static through nn.remat)."""
    from flowtrain_stochastic_interpolation_tpu.models.unet import UNet3D

    common = dict(dim=8, dim_mults=(1, 2), data_channels=15, dropout=0.1,
                  time_resolution=16, time_bandwidth=10.0,
                  time_learned_emb=True, attn_dim_head=4, attn_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 15))
    t = jnp.array([0.3, 0.7])
    m0, m1 = UNet3D(**common), UNet3D(**common, remat_blocks=True)
    v0 = m0.init(jax.random.PRNGKey(1), x, t)
    v1 = m1.init(jax.random.PRNGKey(1), x, t)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    def loss(vs, m):
        return jnp.sum(jnp.square(m.apply(vs, x, t, deterministic=True)))

    l0, g0 = jax.value_and_grad(loss)(v0, m0)
    l1, g1 = jax.value_and_grad(loss)(v1, m1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        # recompute reorders float accumulation: observed max 3.5e-4 relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)

    out = m1.apply(v1, x, t, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out)).all()
