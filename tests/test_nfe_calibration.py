"""Fixed-NFE vs adaptive-sampler equivalence (SURVEY.md §7 "hard parts").

The reference samples with adaptive dopri5 (``solvers.py:77``); the driver
metric is samples/min at *fixed* NFE.  This test shows the calibration holds:
integrating a (random-weight) UNet velocity field with the fixed-NFE RK4
sampler decodes to the same categorical volume as the adaptive dopri5
reference path — categorical argmax absorbs the small trajectory difference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.models import UNet3D
from flowtrain_stochastic_interpolation_tpu.ops.embedding import decode, simplex_embedding
from flowtrain_stochastic_interpolation_tpu.solvers import solve_ode, solve_ode_adaptive

TINY = dict(
    dim=8, dim_mults=(1, 2), data_channels=15, dropout=0.0,
    time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
    attn_dim_head=4, attn_heads=2,
)


def test_fixed_nfe_decodes_like_adaptive():
    model = UNet3D(**TINY)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 15))
    t = jnp.zeros((2,))
    variables = model.init(jax.random.PRNGKey(1), x0, t)
    table = jnp.asarray(simplex_embedding(15, 15))
    velocity = lambda x, tt: model.apply(variables, x, tt)

    traj_a, nfe = solve_ode_adaptive(
        velocity, x0, t0=0.001, tf=1.0, n_frames=4, atol=1e-5, rtol=1e-5
    )
    traj_f = solve_ode(
        velocity, x0, t0=0.001, tf=1.0, n_frames=16, substeps=2, method="rk4"
    )
    dec_a = np.asarray(decode(traj_a[-1], table))
    dec_f = np.asarray(decode(traj_f[-1], table))
    agreement = (dec_a == dec_f).mean()
    assert agreement > 0.99, f"decode agreement {agreement:.4f}, adaptive NFE {int(nfe)}"
    # the continuous endpoints themselves are close
    rel = float(
        jnp.linalg.norm(traj_a[-1] - traj_f[-1]) / jnp.linalg.norm(traj_a[-1])
    )
    assert rel < 5e-2, rel


@pytest.mark.slow
def test_fixed_nfe_decodes_like_adaptive_flagship_shape():
    """Same calibration at the flagship 64³ grid (VERDICT r3 #5).

    Tiny channel count keeps the CPU cost tractable; the *spatial* extent —
    the thing that changes the ODE's stiffness profile via the UNet's
    multi-scale stages — matches production (reference samples 64³,
    ``model_train_inference.py:617-654``).  Run in the slow tier.
    """
    model = UNet3D(**TINY)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 64, 15)) \
        .astype(jnp.bfloat16)
    t = jnp.zeros((1,))
    variables = model.init(jax.random.PRNGKey(3), x0, t)
    table = jnp.asarray(simplex_embedding(15, 15))
    velocity = lambda x, tt: model.apply(variables, x, tt)

    traj_a, nfe = jax.jit(
        lambda x: solve_ode_adaptive(
            velocity, x, t0=0.001, tf=1.0, n_frames=4, atol=1e-4, rtol=1e-4
        )
    )(x0)
    assert int(nfe) > 0, "adaptive solve truncated"
    final_f = jax.jit(
        lambda x: solve_ode(
            x0=x, velocity_fn=velocity, t0=0.001, tf=1.0, n_frames=16,
            substeps=2, method="rk4",
        )[-1]
    )(x0)
    dec_a = np.asarray(decode(traj_a[-1], table))
    dec_f = np.asarray(decode(final_f, table))
    agreement = (dec_a == dec_f).mean()
    assert agreement > 0.97, (
        f"decode agreement {agreement:.4f}, adaptive NFE {int(nfe)}"
    )
