"""End-to-end inference pipeline tests on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.inference import (
    build_atb,
    make_sampler,
    sample_conditional,
    sample_unconditional,
)
from flowtrain_stochastic_interpolation_tpu.models import UNet3D, UNet3DCond
from flowtrain_stochastic_interpolation_tpu.ops.embedding import simplex_embedding

TINY = dict(
    dim=8, dim_mults=(1, 2), data_channels=15, dropout=0.0,
    time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
    attn_dim_head=4, attn_heads=2, dtype=None,
)


def _uncond():
    model = UNet3D(**TINY)
    x = jnp.zeros((1, 8, 8, 8, 15))
    t = jnp.zeros((1,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    table = jnp.asarray(simplex_embedding(15, 15))
    return model, variables, table


def test_sample_unconditional_shapes_and_seeding():
    model, variables, table = _uncond()
    kwargs = dict(
        n_samples=3, batch_size=2, data_shape=(8, 8, 8), embedding_dim=15,
        seed=7, n_frames=4, substeps=1, method="euler", verbose=False,
        with_prominence=True,
    )
    r1 = sample_unconditional(model, variables, table, **kwargs)
    assert r1.decoded.shape == (3, 8, 8, 8)
    assert r1.decoded.min() >= 0 and r1.decoded.max() < 15
    assert r1.prominence.shape == (3, 8, 8, 8)
    r2 = sample_unconditional(model, variables, table, **kwargs)
    np.testing.assert_array_equal(r1.decoded, r2.decoded)  # seeded determinism


def test_sampler_trajectory_and_adaptive():
    model, variables, table = _uncond()
    sampler = make_sampler(
        model, variables, table, n_frames=4, substeps=1, method="heun",
        keep_trajectory=True,
    )
    out = sampler(jnp.zeros((1, 8, 8, 8, 15)))
    assert out["trajectory"].shape == (4, 1, 8, 8, 8, 15)
    sampler_a = make_sampler(model, variables, table, n_frames=3, adaptive=True,
                             atol=1e-3, rtol=1e-3)
    out_a = sampler_a(jnp.zeros((1, 8, 8, 8, 15)))
    assert int(out_a["nfe"]) > 0


def test_sample_conditional_end_to_end():
    model = UNet3DCond(**TINY, variant="v3")
    x = jnp.zeros((1, 8, 8, 8, 15))
    t = jnp.zeros((1,))
    variables = model.init(jax.random.PRNGKey(0), x, x, t)
    table = jnp.asarray(simplex_embedding(15, 15))

    true = jax.random.randint(jax.random.PRNGKey(1), (8, 8, 8), -1, 14)
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.1, (8, 8, 8))
    atb = build_atb(true, mask, table)
    assert atb.shape == (8, 8, 8, 15)
    # unobserved voxels carry zero conditioning
    assert float(jnp.abs(atb[~mask]).max()) == 0.0

    result = sample_conditional(
        model, variables, table, atb,
        n_samples=3, batch_size=2, seed=42,
        n_frames=3, substeps=1, method="euler", verbose=False,
    )
    assert result.decoded.shape == (3, 8, 8, 8)


def test_donate_x0_sampler_matches_and_invalidates():
    """donate_x0=True frees the noise buffer into the program (the 128³
    single-chip HBM lever): results are identical, and the donated input is
    consumed (a second use of the same buffer must fail)."""
    model, variables, table = _uncond()
    kwargs = dict(n_frames=4, substeps=1, method="rk4")
    plain = make_sampler(model, variables, table, **kwargs)
    donating = make_sampler(model, variables, table, donate_x0=True, **kwargs)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 8, 15))
    ref = np.asarray(plain(x0)["decoded"])
    out = donating(x0)
    np.testing.assert_array_equal(ref, np.asarray(out["decoded"]))
    if jax.default_backend() not in ("cpu",):  # CPU ignores donation
        assert x0.is_deleted()


def test_frame_dispatch_matches_fused():
    """Host-looped per-frame dispatch (the 128³ tunnel-ceiling workaround)
    visits the identical time grid as the fused lax.scan sampler; states
    agree to float-accumulation tolerance (in the fused program the step
    size is a baked constant XLA folds differently than the per-frame
    program's runtime argument) and the categorical decode agrees on
    essentially every voxel — unconditional and conditional, trajectory
    collected host-side."""
    model, variables, table = _uncond()
    kwargs = dict(n_frames=4, substeps=2, method="rk4",
                  keep_trajectory=True, with_prominence=True)
    fused = make_sampler(model, variables, table, **kwargs)
    framed = make_sampler(model, variables, table, frame_dispatch=True, **kwargs)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 8, 15))
    a = fused(x0)
    b = framed(x0)
    np.testing.assert_allclose(
        np.asarray(a["trajectory"]), b["trajectory"], rtol=2e-4, atol=2e-5
    )
    assert (np.asarray(a["decoded"]) == np.asarray(b["decoded"])).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(a["prominence"]), np.asarray(b["prominence"]), atol=1e-3
    )

    # conditional: ATb as runtime arg through the per-frame programs
    cond = UNet3DCond(**TINY, variant="v3")
    xz = jnp.zeros((1, 8, 8, 8, 15))
    cvars = cond.init(jax.random.PRNGKey(1), xz, xz, jnp.zeros((1,)))
    atb = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 15))
    ckw = dict(n_frames=3, substeps=1, method="heun", conditional=True)
    cf = make_sampler(cond, cvars, table, **ckw)
    cfr = make_sampler(cond, cvars, table, frame_dispatch=True, **ckw)
    xc = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, 15))
    agree = (np.asarray(cf(xc, atb)["decoded"])
             == np.asarray(cfr(xc, atb)["decoded"])).mean()
    assert agree > 0.999, agree


def test_bfloat16_state_sampling_matches_float32():
    """bf16 integration state (the 128³ RK4 single-chip memory lever): the
    scan carry stays bf16 end-to-end (velocity cast in the solver) and the
    categorical decode agrees with the f32-state pipeline for nearly every
    voxel."""
    model, variables, table = _uncond()
    sampler = make_sampler(model, variables, table,
                           n_frames=4, substeps=1, method="rk4")
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, 15), jnp.float32)
    ref = np.asarray(sampler(x0)["decoded"])
    bf = np.asarray(sampler(x0.astype(jnp.bfloat16))["decoded"])
    assert (ref == bf).mean() > 0.97, (ref == bf).mean()


def test_sde_sampler_end_to_end():
    """method='sde' sampling surface (VERDICT r4 #6): decodes valid
    categories, is seeded-deterministic, and differs from the ODE path."""
    model, variables, table = _uncond()
    kwargs = dict(
        n_samples=2, batch_size=2, data_shape=(8, 8, 8), embedding_dim=15,
        seed=7, n_frames=4, substeps=2, method="sde", verbose=False,
        sde_epsilon=0.5, sde_eps_schedule="linear_decay",
        t0=1e-3, tf=1 - 1e-3,
    )
    r1 = sample_unconditional(model, variables, table, **kwargs)
    assert r1.decoded.shape == (2, 8, 8, 8)
    assert r1.decoded.min() >= 0 and r1.decoded.max() < 15
    r2 = sample_unconditional(model, variables, table, **kwargs)
    np.testing.assert_array_equal(r1.decoded, r2.decoded)  # seeded
    ode = sample_unconditional(
        model, variables, table,
        **{**kwargs, "method": "euler", "sde_epsilon": 0.5},
    )
    assert (r1.decoded != ode.decoded).mean() > 0.0  # diffusion changed paths


def test_sde_sampler_requires_key():
    model, variables, table = _uncond()
    sampler = make_sampler(model, variables, table, method="sde",
                           n_frames=4, substeps=1, t0=1e-3, tf=1 - 1e-3)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 15))
    try:
        sampler(x0)
        raise AssertionError("expected ValueError without a key")
    except ValueError:
        pass
