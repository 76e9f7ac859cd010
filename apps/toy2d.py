"""2D toy experiment: flow matching N(0,I) → Gaussian mixture, trajectory plot.

The reference validates its interpolant/solver stack on 2D practice
distributions (``src/flowtrain/dataloaders/practicedata.py:9-77``) with ODE
trajectory plots (``src/flowtrain/utils/plotting.py:229-264``).  This app is
the end-to-end equivalent: train a small velocity MLP with the flow objective
and render the learned transport.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flowtrain_stochastic_interpolation_tpu.data.toy import GaussianMixed
from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.models.mlp import VelocityMLP
from flowtrain_stochastic_interpolation_tpu.solvers import solve_ode
from flowtrain_stochastic_interpolation_tpu.utils.plotting import plot_trajectories


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "figures", "toy2d_trajectories.png"))
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="'cpu' forces the CPU backend before XLA init")
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    target = GaussianMixed()
    interp = LinearInterpolant(one_sided=True)
    model = VelocityMLP()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        x1 = target.sample(k1, args.batch_size)
        x0 = jax.random.normal(k2, x1.shape)
        t = jax.random.uniform(k3, (args.batch_size,), minval=1e-3, maxval=1 - 1e-3)
        xt, vt = interp.flow_objective(t, x0, x1)

        def loss_fn(p):
            v_hat = model.apply({"params": p}, xt, t)
            return jnp.mean(jnp.square(v_hat - vt)) / jnp.mean(jnp.square(vt))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 200 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    print(f"trained {args.steps} steps in {time.perf_counter() - t0:.1f}s")

    velocity = lambda x, t: model.apply({"params": params}, x, t)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    traj = solve_ode(velocity, x0, t0=1e-3, tf=1 - 1e-3, n_frames=32,
                     substeps=2, method="rk4")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    plot_trajectories(np.asarray(traj), save_path=args.out)

    final = np.asarray(traj[-1])
    print(f"final sample mean {final.mean(0)}, expected mixture mean ~[-0.4, -0.4]")
    print(f"trajectory figure: {args.out}")


if __name__ == "__main__":
    main()
