"""Jittable adaptive Dormand–Prince 5(4) integrator.

Replaces the reference's host-driven ``torchdiffeq.odeint(..., method="dopri5")``
(``/root/reference/src/flowtrain/solvers/solvers.py:9,77``) with a single
compiled program: a ``lax.scan`` over save-grid segments with an adaptive
``lax.while_loop`` inside each segment.  FSAL (first-same-as-last) stage reuse
keeps NFE at ``6 per accepted step + 5 per rejection`` after the initial eval,
matching dopri5's textbook cost.

Error control follows torchdiffeq's defaults: mixed absolute/relative RMS norm
``rms(err / (atol + rtol * max(|y|, |y_new|)))`` with safety 0.9 and step-size
factors clamped to [0.2, 10].
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import Array

# Dormand–Prince 5(4) Butcher tableau.
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
# 5th-order solution weights == last row of A (FSAL property).
_B5 = _A[6]
# 4th-order embedded weights.
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)
_E = tuple(b5 - b4 for b5, b4 in zip(_B5 + (0.0,), _B4))

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER = 5.0


def _error_norm(err: Array, y0: Array, y1: Array, atol: float, rtol: float) -> Array:
    # promoted to f32 BEFORE the divide: with a bf16 state the ratio would
    # otherwise be formed at ~2^-8 relative precision, i.e. far coarser than
    # the 1e-6 tolerances it controls
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1)).astype(jnp.float32)
    r = err.astype(jnp.float32) / scale
    return jnp.sqrt(jnp.mean(r * r))


def dopri5_integrate(
    f: Callable[[Array, Array], Array],
    y0: Array,
    ts: Array,
    *,
    atol: float = 1e-6,
    rtol: float = 1e-6,
    max_steps: int = 4096,
) -> Tuple[Array, Array]:
    """Integrate ``dy/dt = f(y, t)`` saving the solution at each ``ts[i]``.

    Args:
      f: vector field taking ``(y, t_scalar)``; t is a 0-d array.
      y0: initial state at ``ts[0]``.
      ts: strictly increasing 1-D save grid.
      atol, rtol: tolerances (reference uses 1e-6/1e-6, ``solvers.py:35``).
      max_steps: per-segment attempt cap (accepted + rejected) — a compile-time
        backstop against pathological fields.

    Returns:
      ``(ys [len(ts), *y0.shape], nfe int32)`` — trajectory and total number
      of function evaluations.  If any segment hit ``max_steps`` before
      reaching its end time (truncated integration), ``nfe`` is returned
      **negated** — callers must treat ``nfe < 0`` as a failed solve.
    """
    # Time/controller arithmetic stays in >= float32 regardless of the state
    # dtype — step-size control at bf16 precision (~2^-8 ulp) would make the
    # accept/advance loop drift and the `t < t_end` test meaningless.  Only
    # the state updates are cast to the (possibly bf16) state dtype, matching
    # the fixed-NFE steppers' discipline (solvers/__init__.py `hx`).
    time_dtype = jnp.promote_types(jnp.result_type(ts), jnp.float32)
    ts = jnp.asarray(ts, dtype=time_dtype)
    t0 = ts[0]

    k1_init = f(y0, t0)
    dt_init = jnp.asarray(
        (ts[-1] - ts[0]) / jnp.maximum(ts.shape[0] * 4, 32), time_dtype
    )

    def rk_step(y, t, dt, k1):
        dt_y = dt.astype(y.dtype)  # state arithmetic in the state dtype
        ks = [k1]
        for i in range(1, 7):
            yi = y
            for aij, kj in zip(_A[i], ks):
                yi = yi + dt_y * aij * kj
            ks.append(f(yi, t + _C[i] * dt))
        y_new = y
        for b, k in zip(_B5, ks[:-1]):  # b7 == 0 in B5 row of length 6
            y_new = y_new + dt_y * b * k
        # NB: _B5 has 6 entries (a7 row); stage 7 is f(y_new) and feeds only
        # the error estimate + FSAL reuse.
        err = jnp.zeros_like(y)
        for e, k in zip(_E, ks):
            err = err + dt_y * e * k
        return y_new, ks[-1], err

    def segment(carry, t_end):
        y, t, dt, k1, nfe = carry

        def cond(state):
            y, t, dt, k1, nfe, n_attempts = state
            return (t < t_end - 1e-12) & (n_attempts < max_steps)

        def body(state):
            y, t, dt, k1, nfe, n_attempts = state
            dt_c = jnp.minimum(dt, t_end - t)
            y_new, k7, err = rk_step(y, t, dt_c, k1)
            norm = _error_norm(err, y, y_new, atol, rtol)
            accept = norm <= 1.0
            factor = jnp.clip(
                _SAFETY * jnp.power(jnp.maximum(norm, 1e-10), -1.0 / _ORDER),
                _MIN_FACTOR,
                _MAX_FACTOR,
            ).astype(dt.dtype)
            dt_next = dt_c * factor
            y = jnp.where(accept, y_new, y)
            t = jnp.where(accept, t + dt_c, t)
            k1 = jnp.where(accept, k7, k1)
            return (y, t, dt_next, k1, nfe + 6, n_attempts + 1)

        y, t, dt, k1, nfe, _ = jax.lax.while_loop(
            cond, body, (y, t, dt, k1, nfe, jnp.int32(0))
        )
        # segment truncated: attempt cap reached before t_end
        seg_truncated = t < t_end - 1e-12
        return (y, t, dt, k1, nfe), (y, seg_truncated)

    init = (y0, t0, dt_init, k1_init, jnp.int32(1))
    (_, _, _, _, nfe), (ys, truncs) = jax.lax.scan(segment, init, ts[1:])
    nfe = jnp.where(jnp.any(truncs), -nfe, nfe)
    return jnp.concatenate([y0[None], ys], axis=0), nfe
