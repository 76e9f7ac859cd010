"""Solver tests: convergence order, adaptive accuracy, masks, SDE sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.solvers import (

    ODEFlowSolver,
    ode_sol_rk4,
    solve_denoising_ode,
    solve_denoising_sde,
    solve_ode,
    solve_ode_adaptive,
)

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


def linear_field(x, t):
    """dx/dt = -x  =>  x(t) = x0 * exp(-t)."""
    del t
    return -x


def cosine_field(x, t):
    """dx/dt = cos(2 pi t) * ones  =>  x(t) = x0 + sin(2 pi t)/(2 pi)."""
    tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
    return jnp.cos(2 * jnp.pi * tb) * jnp.ones_like(x)


def exact_exp(x0, t):
    return x0 * np.exp(-t)


@pytest.mark.parametrize(
    "method,order,substeps_pair",
    [("euler", 1, (8, 16)), ("heun", 2, (4, 8)), ("midpoint", 2, (4, 8)), ("rk4", 4, (1, 2))],
)
def test_convergence_order(method, order, substeps_pair):
    # step counts chosen so float32 roundoff stays well below truncation error
    x0 = jnp.ones((1, 4))
    errs = []
    for substeps in substeps_pair:
        traj = solve_ode(
            linear_field, x0, t0=0.0, tf=1.0, n_frames=2, substeps=substeps, method=method
        )
        errs.append(float(jnp.abs(traj[-1] - exact_exp(1.0, 1.0)).max()))
    observed = np.log2(errs[0] / errs[1])
    assert observed > order - 0.4, f"{method}: observed order {observed:.2f} < {order}"


def test_trajectory_frames_match_exact_solution():
    x0 = jnp.full((2, 3), 2.0)
    traj = solve_ode(linear_field, x0, t0=0.0, tf=1.0, n_frames=9, substeps=8, method="rk4")
    ts = np.linspace(0, 1, 9)
    for i, t in enumerate(ts):
        np.testing.assert_allclose(np.asarray(traj[i]), exact_exp(2.0, t), rtol=1e-5)


def test_solve_ode_final_matches_trajectory_end():
    """solve_ode_final must equal solve_ode(...)[-1] bitwise (same steps, no
    trajectory buffer — the memory-lean path used by make_sampler)."""
    from flowtrain_stochastic_interpolation_tpu.solvers import solve_ode_final

    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 5))
    for method in ("euler", "rk4"):
        traj = solve_ode(cosine_field, x0, t0=0.0, tf=1.0, n_frames=5,
                         substeps=3, method=method)
        final = solve_ode_final(cosine_field, x0, t0=0.0, tf=1.0, n_frames=5,
                                substeps=3, method=method)
        np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(final))
    # frozen mask support parity
    mask = jnp.asarray([[True, False, False, True, False]] * 2)
    traj = solve_ode(cosine_field, x0, n_frames=4, substeps=2, frozen_mask=mask)
    final = solve_ode_final(cosine_field, x0, n_frames=4, substeps=2,
                            frozen_mask=mask)
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(final))


def test_adaptive_dopri5_accuracy_and_nfe():
    x0 = jnp.ones((1, 8))
    traj, nfe = solve_ode_adaptive(
        linear_field, x0, t0=0.0, tf=1.0, n_frames=16, atol=1e-6, rtol=1e-6
    )
    ts = np.linspace(0, 1, 16)
    np.testing.assert_allclose(
        np.asarray(traj)[:, 0, 0], exact_exp(1.0, ts), rtol=1e-5, atol=1e-7
    )
    assert int(nfe) < 2000


def test_adaptive_bf16_state():
    """Adaptive dopri5 with a bf16 state: the controller must run in f32.

    VERDICT r3 weak #4 — the save grid / step-size control previously
    inherited the state dtype; at bf16 the accept/advance loop would drift.
    The state itself stays bf16 (carry dtype pinned), while the result must
    still track the exact solution to bf16-resolution accuracy.
    """
    x0 = jnp.ones((1, 8), jnp.bfloat16)
    traj, nfe = solve_ode_adaptive(
        linear_field, x0, t0=0.0, tf=1.0, n_frames=16, atol=1e-4, rtol=1e-4
    )
    assert traj.dtype == jnp.bfloat16
    assert int(nfe) > 0, "solve must not truncate"
    ts = np.linspace(0, 1, 16)
    np.testing.assert_allclose(
        np.asarray(traj, np.float32)[:, 0, 0], exact_exp(1.0, ts),
        rtol=2e-2, atol=1e-2,
    )
    # f32-state run with identical tolerances takes a comparable step count:
    # the bf16 state must not break the controller into pathological rejects
    _, nfe32 = solve_ode_adaptive(
        linear_field, jnp.ones((1, 8)), t0=0.0, tf=1.0, n_frames=16,
        atol=1e-4, rtol=1e-4,
    )
    assert int(nfe) <= 4 * int(nfe32), (int(nfe), int(nfe32))


def test_adaptive_nonautonomous():
    x0 = jnp.zeros((1, 2))
    traj, _ = solve_ode_adaptive(cosine_field, x0, t0=0.0, tf=0.75, n_frames=4)
    exact = np.sin(2 * np.pi * 0.75) / (2 * np.pi)
    np.testing.assert_allclose(np.asarray(traj[-1]), exact, atol=1e-5)


def test_frozen_mask_freezes_entries():
    x0 = jnp.ones((1, 4))
    mask = jnp.array([[True, False, True, False]])
    traj = solve_ode(linear_field, x0, n_frames=5, substeps=4, frozen_mask=mask)
    final = np.asarray(traj[-1][0])
    np.testing.assert_allclose(final[[0, 2]], 1.0)  # frozen
    np.testing.assert_allclose(final[[1, 3]], np.exp(-1.0), rtol=1e-4)
    traj_a, _ = solve_ode_adaptive(linear_field, x0, n_frames=5, frozen_mask=mask)
    np.testing.assert_allclose(np.asarray(traj_a[-1][0])[[0, 2]], 1.0)


def test_ode_sol_rk4_matches_reference_convention():
    x0 = jnp.ones((2, 3))
    traj = ode_sol_rk4(x0, linear_field, nsteps=100, tf=1.0)
    assert traj.shape == (100, 2, 3)
    # reference takes nsteps-1 steps of h=Tf/nsteps => reaches t = (n-1)/n
    np.testing.assert_allclose(np.asarray(traj[-1]), exact_exp(1.0, 0.99), rtol=1e-5)


def test_denoising_ode_recovers_gaussian_mean_shift():
    """With rho1 = delta(mu), the perfect denoiser is eta(x,t) = (x - beta*mu)/alpha.

    The eq-(6.7) velocity then transports any x0 exactly onto mu at t=1.
    """
    mu = 3.0
    interp = LinearInterpolant(one_sided=True)

    def denoiser(x, t):
        tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
        return (x - interp.beta(tb) * mu) / interp.alpha(tb)

    x0 = jnp.array([[1.0, -2.0, 0.5]])
    t0, tf = 1e-3, 1 - 1e-3
    traj = solve_denoising_ode(
        denoiser, interp, x0, t0=t0, tf=tf, n_frames=8, substeps=8, method="rk4"
    )
    # the exact transport is x(t) = alpha(t)/alpha(t0)*... — for the linear
    # one-sided interpolant with this denoiser, x(tf) = alpha(tf)*x0' + beta(tf)*mu
    # where x0 sits at time t0; exact flow maps x(t) = a(t)x0~ + b(t)mu with the
    # same latent x0~ = (x0 - beta(t0)*mu)/alpha(t0).
    x0_lat = (np.asarray(x0) - (t0) * mu) / (1 - t0)
    exact = (1 - tf) * x0_lat + tf * mu
    np.testing.assert_allclose(np.asarray(traj[-1]), exact, atol=5e-4)


def test_denoising_sde_converges_to_target_with_noise():
    mu = 2.0
    interp = LinearInterpolant(one_sided=True)

    def denoiser(x, t):
        tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
        return (x - interp.beta(tb) * mu) / interp.alpha(tb)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 1))
    traj = solve_denoising_sde(
        denoiser, interp, x0, jax.random.PRNGKey(1),
        epsilon=lambda t: 0.5 * (1 - t), t0=1e-3, tf=1 - 1e-3, n_frames=16, substeps=4,
    )
    final = np.asarray(traj[-1])
    assert abs(final.mean() - mu) < 0.2
    assert final.std() < 0.3  # collapsed onto the delta target


def test_solver_wrapper_api():
    solver = ODEFlowSolver(linear_field, adaptive=False, method="rk4", substeps=2)
    traj = solver.solve(jnp.ones((1, 2)), t0=0.0, tf=1.0, n_steps=8)
    assert traj.shape == (8, 1, 2)
    solver_a = ODEFlowSolver(lambda x, t: -x, adaptive=True)
    traj_a = solver_a.solve(jnp.ones((1, 2)), n_steps=8)
    np.testing.assert_allclose(np.asarray(traj_a[-1]), np.exp(-1.0), rtol=1e-5)


def test_solvers_are_jittable():
    f = jax.jit(lambda x0: solve_ode(linear_field, x0, n_frames=4, substeps=2)[-1])
    np.testing.assert_allclose(np.asarray(f(jnp.ones((1, 2)))), np.exp(-1), rtol=1e-2)


def test_rk4_lean_matches_tableau():
    """The memory-lean accumulator RK4 (default) must track the generic
    tableau RK4 to ~1 ulp/step accumulation: identical stage states, only the
    final weighted sum associates differently (solvers/__init__.py)."""
    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (2, 8, 8, 3))

    def field(x, t):
        tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
        return -x * (1.0 + 0.5 * jnp.sin(3.0 * tb))

    lean = solve_ode(field, x0, t0=0.001, tf=1.0, n_frames=16, substeps=2,
                     method="rk4")
    tab = solve_ode(field, x0, t0=0.001, tf=1.0, n_frames=16, substeps=2,
                    method="rk4_tableau")
    np.testing.assert_allclose(np.asarray(lean), np.asarray(tab),
                               rtol=2e-5, atol=2e-6)
    # one step, nearly bitwise (single final-sum rounding difference)
    lean1 = solve_ode(field, x0, n_frames=2, substeps=1, method="rk4")
    tab1 = solve_ode(field, x0, n_frames=2, substeps=1, method="rk4_tableau")
    np.testing.assert_allclose(np.asarray(lean1), np.asarray(tab1),
                               rtol=2e-7, atol=2e-7)


def test_velocity_to_denoiser_roundtrip():
    """velocity_to_denoiser inverts denoiser_to_velocity exactly (the
    rearranged form divides by the Wronskian, not by beta -> stable)."""
    from flowtrain_stochastic_interpolation_tpu.solvers import (
        denoiser_to_velocity,
        velocity_to_denoiser,
    )

    interp = LinearInterpolant(one_sided=True)

    def denoiser(x, t):
        tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
        return jnp.sin(x) * (1.0 + tb)

    vel = denoiser_to_velocity(denoiser, interp)
    eta_back = velocity_to_denoiser(vel, interp)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7))
    for tval in (1e-3, 0.3, 0.77, 1 - 1e-3):
        t = jnp.full((4,), tval)
        np.testing.assert_allclose(
            np.asarray(eta_back(x, t)), np.asarray(denoiser(x, t)),
            rtol=2e-5, atol=2e-5,
        )


def test_velocity_sde_eps0_equals_euler_ode():
    """epsilon=0 reduces solve_velocity_sde to the Euler ODE flow on the
    same time grid (diffusion off, drift = velocity)."""
    from flowtrain_stochastic_interpolation_tpu.solvers import solve_velocity_sde

    interp = LinearInterpolant(one_sided=True)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
    kw = dict(t0=1e-3, tf=1 - 1e-3, n_frames=8, substeps=4)
    traj_sde = solve_velocity_sde(
        linear_field, interp, x0, jax.random.PRNGKey(1), epsilon=0.0, **kw
    )
    traj_ode = solve_ode(linear_field, x0, method="euler", **kw)
    np.testing.assert_allclose(
        np.asarray(traj_sde), np.asarray(traj_ode), rtol=1e-6, atol=1e-6
    )
    final_only = solve_velocity_sde(
        linear_field, interp, x0, jax.random.PRNGKey(1), epsilon=0.0,
        keep_trajectory=False, **kw
    )
    np.testing.assert_allclose(
        np.asarray(final_only), np.asarray(traj_sde[-1]), rtol=1e-6
    )


def test_velocity_sde_converges_to_target_with_noise():
    """Velocity-model SDE sampling (the flagship-checkpoint form) collapses
    onto a delta target, like the denoiser-model SDE above it."""
    from flowtrain_stochastic_interpolation_tpu.solvers import (
        denoiser_to_velocity,
        eps_schedule,
        solve_velocity_sde,
    )

    mu = 2.0
    interp = LinearInterpolant(one_sided=True)

    def denoiser(x, t):
        tb = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
        return (x - interp.beta(tb) * mu) / interp.alpha(tb)

    vel = denoiser_to_velocity(denoiser, interp)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 1))
    traj = solve_velocity_sde(
        vel, interp, x0, jax.random.PRNGKey(1),
        epsilon=eps_schedule("linear_decay", 0.5),
        t0=1e-3, tf=1 - 1e-3, n_frames=16, substeps=4,
    )
    final = np.asarray(traj[-1])
    assert abs(final.mean() - mu) < 0.2
    assert final.std() < 0.3
