"""Stochastic-interpolant schedules and training objectives (pure JAX).

TPU-native rebuild of the reference interpolant layer
(``/root/reference/src/flowtrain/interpolation/interpolation.py:43-546``):
the five spatially-linear interpolants of Albergo, Boffi & Vanden-Eijnden,
"Stochastic Interpolants: A Unifying Framework for Flows and Diffusions"
(arXiv:2303.08797, §4), plus the velocity ("flow"), denoising, and score
objectives built from them.

Everything here is a pure function of ``(t, x0, x1[, z])``; interpolants are
frozen dataclasses (hashable, so they can be closed over or passed as static
arguments to ``jax.jit``).  Time ``t`` may be a scalar or a ``[N]`` batch
vector; it is broadcast against the leading axis of the data.

Interpolants provided (reference lines cited for behavioural parity):

==================  ===========================  ====================================
name                alpha / beta                 gamma
==================  ===========================  ====================================
LinearInterpolant   1-t / t                      sqrt(a*t*(1-t))   (``:379-412``)
TrigInterpolant     cos(pi t/2) / sin(pi t/2)    sqrt(a*t*(1-t))   (``:415-449``)
EncDecInterpolant   cos^2(pi t) split at t=1/2   sin^2(pi t)       (``:452-483``)
SBDMInterpolant     sqrt(1-t^2) / t              0 (one-sided)     (``:486-513``)
MirrorInterpolant   0 / 1                        sqrt(a*t*(1-t))   (``:516-546``)
==================  ===========================  ====================================
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array


def bcast_time(t: Array, x: Array) -> Array:
    """Broadcast a scalar or ``[N]`` time vector against data ``x``.

    Mirrors the reference ``reshape_time`` decorator
    (``interpolation.py:27-40``): ``t: [N] -> [N, 1, 1, ...]`` so that
    schedule values multiply per-sample.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        return t
    if t.ndim == 1:
        return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
    if t.ndim == x.ndim:
        return t
    raise ValueError(f"time must be scalar, [N], or data-rank; got {t.shape}")


@dataclasses.dataclass(frozen=True)
class Interpolant:
    """Base class: alpha/beta/gamma schedule of a spatially linear interpolant.

    ``one_sided=True`` means the initial point X0 *is* the latent noise (no
    separate Z); gamma is then identically zero and the score uses alpha
    (reference ``interpolation.py:245-251``).
    """

    one_sided: bool = False

    # --- schedule -----------------------------------------------------------
    def alpha(self, t: Array) -> Array:
        raise NotImplementedError

    def beta(self, t: Array) -> Array:
        raise NotImplementedError

    def gamma(self, t: Array) -> Array:
        raise NotImplementedError

    def alpha_dot(self, t: Array) -> Array:
        raise NotImplementedError

    def beta_dot(self, t: Array) -> Array:
        raise NotImplementedError

    def gamma_dot(self, t: Array) -> Array:
        raise NotImplementedError

    # --- objectives (reference StochasticInterpolator methods) ---------------
    def _check_z(self, z: Optional[Array]) -> None:
        if not self.one_sided and z is None:
            raise ValueError("Z must be provided for two-sided interpolants")

    def get_xt(self, t: Array, x0: Array, x1: Array, z: Optional[Array] = None) -> Array:
        """Interpolated point ``XT = alpha*X0 + beta*X1 (+ gamma*Z)``.

        Reference ``interpolation.py:158-185`` (eq 2.1).
        """
        self._check_z(z)
        # coefficients are evaluated in t's dtype (f32 for precision of the
        # schedule), then follow the *state* dtype: with bf16 x the combine
        # stays bf16 instead of promoting every [B,X,Y,Z,E] buffer to f32 —
        # the memory-lean objective used for 128³ single-chip training
        tb = bcast_time(t, x0)
        xt = self.alpha(tb).astype(x0.dtype) * x0 + self.beta(tb).astype(x1.dtype) * x1
        if z is not None:
            xt = xt + self.gamma(tb).astype(z.dtype) * z
        return xt

    def get_bt(self, t: Array, x0: Array, x1: Array, z: Optional[Array] = None) -> Array:
        """Conditional velocity ``BT = alpha_dot*X0 + beta_dot*X1 (+ gamma_dot*Z)``.

        Reference ``interpolation.py:189-216`` (eq 2.10).
        """
        self._check_z(z)
        tb = bcast_time(t, x0)
        bt = (self.alpha_dot(tb).astype(x0.dtype) * x0
              + self.beta_dot(tb).astype(x1.dtype) * x1)
        if z is not None:
            bt = bt + self.gamma_dot(tb).astype(z.dtype) * z
        return bt

    def flow_objective(
        self, t: Array, x0: Array, x1: Array, z: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """``(XT, BT)`` pair for velocity-matching training (eq 2.13).

        Reference ``interpolation.py:80-117``.
        """
        return self.get_xt(t, x0, x1, z), self.get_bt(t, x0, x1, z)

    def denoising_objective(
        self, t: Array, x0: Array, x1: Array, z: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """``(XT, Z)`` pair for denoising training (eq 2.19); one-sided uses X0.

        Reference ``interpolation.py:121-154``.
        """
        xt = self.get_xt(t, x0, x1, z)
        target = x0 if self.one_sided else z
        if target is None:
            raise ValueError("Z must be provided for two-sided interpolants")
        return xt, target

    def get_st(self, t: Array, z: Array) -> Array:
        """Score ``ST = -Z / gamma`` (alpha for one-sided, eq 2.14).

        Reference ``interpolation.py:228-251``.
        """
        tb = bcast_time(t, z)
        g = self.alpha(tb) if self.one_sided else self.gamma(tb)
        return -z / g

    def get_vt(self, t: Array, x0: Array, x1: Array) -> Array:
        """Mean velocity without the latent term (reference ``:254-274``)."""
        tb = bcast_time(t, x0)
        return self.alpha_dot(tb) * x0 + self.beta_dot(tb) * x1

    def get_bt_from_score(self, t: Array, vt: Array, st: Array) -> Array:
        """``BT = VT - gamma_dot*gamma*ST`` (reference ``:219-225``)."""
        tb = bcast_time(t, vt)
        return vt - self.gamma_dot(tb) * self.gamma(tb) * st


def _gamma_sqrt(t: Array, a: float) -> Array:
    return jnp.sqrt(a * t * (1.0 - t))


def _gamma_sqrt_dot(t: Array, a: float) -> Array:
    return 0.5 * a * (1.0 - 2.0 * t) / jnp.sqrt(a * t * (1.0 - t))


@dataclasses.dataclass(frozen=True)
class LinearInterpolant(Interpolant):
    """alpha=1-t, beta=t, gamma=sqrt(a*t*(1-t)) (reference ``:379-412``)."""

    gamma_a: float = 2.0

    def alpha(self, t):
        return 1.0 - t

    def beta(self, t):
        return jnp.asarray(t) * jnp.ones_like(t)  # keep array semantics

    def gamma(self, t):
        if self.one_sided:
            return jnp.zeros_like(t)
        return _gamma_sqrt(t, self.gamma_a)

    def alpha_dot(self, t):
        return -jnp.ones_like(t)

    def beta_dot(self, t):
        return jnp.ones_like(t)

    def gamma_dot(self, t):
        if self.one_sided:
            return jnp.zeros_like(t)
        return _gamma_sqrt_dot(t, self.gamma_a)


@dataclasses.dataclass(frozen=True)
class TrigInterpolant(Interpolant):
    """alpha=cos(pi t/2), beta=sin(pi t/2) (reference ``:415-449``)."""

    gamma_a: float = 2.0

    def alpha(self, t):
        return jnp.cos(math.pi * t / 2.0)

    def beta(self, t):
        return jnp.sin(math.pi * t / 2.0)

    def gamma(self, t):
        if self.one_sided:
            return jnp.zeros_like(t)
        return _gamma_sqrt(t, self.gamma_a)

    def alpha_dot(self, t):
        return -math.pi / 2.0 * jnp.sin(math.pi * t / 2.0)

    def beta_dot(self, t):
        return math.pi / 2.0 * jnp.cos(math.pi * t / 2.0)

    def gamma_dot(self, t):
        if self.one_sided:
            return jnp.zeros_like(t)
        return _gamma_sqrt_dot(t, self.gamma_a)


@dataclasses.dataclass(frozen=True)
class EncDecInterpolant(Interpolant):
    """Encode-decode: alpha/beta are cos^2(pi t) split at t=1/2 (ref ``:452-483``)."""

    def alpha(self, t):
        return jnp.where(t < 0.5, jnp.cos(math.pi * t) ** 2, jnp.zeros_like(t))

    def beta(self, t):
        return jnp.where(t > 0.5, jnp.cos(math.pi * t) ** 2, jnp.zeros_like(t))

    def gamma(self, t):
        return jnp.sin(math.pi * t) ** 2

    def alpha_dot(self, t):
        return jnp.where(t < 0.5, -math.pi * jnp.sin(2.0 * math.pi * t), jnp.zeros_like(t))

    def beta_dot(self, t):
        return jnp.where(t > 0.5, -math.pi * jnp.sin(2.0 * math.pi * t), jnp.zeros_like(t))

    def gamma_dot(self, t):
        return math.pi * jnp.sin(2.0 * math.pi * t)


@dataclasses.dataclass(frozen=True)
class SBDMInterpolant(Interpolant):
    """Score-based diffusion: alpha=sqrt(1-t^2), beta=t, one-sided (ref ``:486-513``)."""

    one_sided: bool = True

    def alpha(self, t):
        return jnp.sqrt(1.0 - t**2)

    def beta(self, t):
        return jnp.asarray(t) * jnp.ones_like(t)

    def gamma(self, t):
        return jnp.zeros_like(t)

    def alpha_dot(self, t):
        return -t / jnp.sqrt(1.0 - t**2)

    def beta_dot(self, t):
        return jnp.ones_like(t)

    def gamma_dot(self, t):
        return jnp.zeros_like(t)


@dataclasses.dataclass(frozen=True)
class MirrorInterpolant(Interpolant):
    """Mirror: alpha=0, beta=1, gamma=sqrt(a*t*(1-t)) (reference ``:516-546``)."""

    gamma_a: float = 2.0

    def alpha(self, t):
        return jnp.zeros_like(t)

    def beta(self, t):
        return jnp.ones_like(t)

    def gamma(self, t):
        return _gamma_sqrt(t, self.gamma_a)

    def alpha_dot(self, t):
        return jnp.zeros_like(t)

    def beta_dot(self, t):
        return jnp.zeros_like(t)

    def gamma_dot(self, t):
        return _gamma_sqrt_dot(t, self.gamma_a)


class StochasticInterpolator:
    """Thin familiarity wrapper mirroring the reference class API.

    The reference exposes objectives through a ``StochasticInterpolator``
    holding an interpolant (``interpolation.py:43-274``).  Here the math lives
    on :class:`Interpolant`; this wrapper keeps the old call-sites working.
    """

    def __init__(self, interpolant: Interpolant):
        self.interp = interpolant

    def __repr__(self) -> str:
        return f"StochasticInterpolator({self.interp})"

    def flow_objective(self, t, x0, x1, z=None):
        return self.interp.flow_objective(t, x0, x1, z)

    def denoising_objective(self, t, x0, x1, z=None):
        return self.interp.denoising_objective(t, x0, x1, z)

    def get_XT(self, t, x0, x1, z=None):
        return self.interp.get_xt(t, x0, x1, z)

    def get_BT(self, t, x0, x1, z=None):
        return self.interp.get_bt(t, x0, x1, z)

    def get_ST(self, t, z):
        return self.interp.get_st(t, z)

    def get_VT(self, t, x0, x1):
        return self.interp.get_vt(t, x0, x1)

    def get_BT_from_score(self, t, vt, st):
        return self.interp.get_bt_from_score(t, vt, st)


INTERPOLANTS = {
    "linear": LinearInterpolant,
    "trig": TrigInterpolant,
    "encdec": EncDecInterpolant,
    "sbdm": SBDMInterpolant,
    "mirror": MirrorInterpolant,
}

__all__ = [
    "Interpolant",
    "LinearInterpolant",
    "TrigInterpolant",
    "EncDecInterpolant",
    "SBDMInterpolant",
    "MirrorInterpolant",
    "StochasticInterpolator",
    "INTERPOLANTS",
    "bcast_time",
]
