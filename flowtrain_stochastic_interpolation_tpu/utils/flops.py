"""Compile-free FLOP accounting from the jaxpr.

``bench.py``'s MFU figures previously came from XLA's post-compile
``cost_analysis()`` — but on the axon remote-TPU tunnel every additional
program costs a multi-minute compile, and the round-4 driver bench was
killed mid-compile before the train metrics landed (BENCH_r04).  Tracing is
device-free: :func:`count_conv_dot_flops` traces the function to a jaxpr
with abstract inputs and sums the matmul/convolution FLOPs analytically.

Two figures differ from the XLA compiled cost:

* elementwise / reduction FLOPs are **excluded** (XLA counts them; on the
  flagship programs they are a small single-digit % — the one-off TPU
  calibration is recorded in BASELINE.md);
* a ``lax.scan`` body is multiplied by its trip count (XLA's analysis
  counts scan bodies ONCE regardless of length, under-reporting the fused
  sampler ~30×, which is why the bench previously costed the *step*
  program via an extra compile).

Conventions match XLA: a dot of [M,K]×[K,N] is ``2·M·N·K`` FLOPs; a
convolution is ``2 · batch · out_spatial · Cout · (Cin/groups) ·
prod(kernel_spatial)``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax import core
from jax._src.core import ClosedJaxpr, Jaxpr  # stable across 0.4–0.9


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    batch = 1.0
    for d in lhs_b:
        batch *= lhs.shape[d]
    contract = 1.0
    for d in lhs_c:
        contract *= lhs.shape[d]
    m = 1.0
    for d in range(len(lhs.shape)):
        if d not in lhs_c and d not in lhs_b:
            m *= lhs.shape[d]
    n = 1.0
    for d in range(len(rhs.shape)):
        if d not in rhs_c and d not in rhs_b:
            n *= rhs.shape[d]
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1) * eqn.params.get(
        "batch_group_count", 1
    )
    batch = lhs.shape[dn.lhs_spec[0]]
    cout = out.shape[dn.out_spec[1]]
    cin = lhs.shape[dn.lhs_spec[1]]
    out_spatial = 1.0
    for d in dn.out_spec[2:]:
        out_spatial *= out.shape[d]
    kernel_spatial = 1.0
    for d in dn.rhs_spec[2:]:
        kernel_spatial *= rhs.shape[d]
    return 2.0 * batch * out_spatial * cout * (cin / groups) * kernel_spatial


def _jaxpr_flops(jaxpr: Jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "cond":
            # data-dependent branch: charge the most expensive one
            total += max(
                (_closed_flops(b) for b in eqn.params["branches"]), default=0.0
            )
        elif name == "while":
            # trip count unknowable from the trace; charge one iteration
            # (document at call sites — the bench programs use scan, not while)
            total += _closed_flops(eqn.params["body_jaxpr"])
            total += _closed_flops(eqn.params["cond_jaxpr"])
        elif name == "scan":
            total += eqn.params["length"] * _closed_flops(eqn.params["jaxpr"])
        else:
            # generic recursion: jit/pjit, remat/checkpoint, custom_vjp/jvp,
            # closed_call, pallas_call with a jaxpr param, ...
            for p in eqn.params.values():
                total += _param_flops(p)
    return total


def _closed_flops(obj: Any) -> float:
    if isinstance(obj, ClosedJaxpr):
        return _jaxpr_flops(obj.jaxpr)
    if isinstance(obj, Jaxpr):
        return _jaxpr_flops(obj)
    return 0.0


def _param_flops(p: Any) -> float:
    if isinstance(p, (ClosedJaxpr, Jaxpr)):
        return _closed_flops(p)
    if isinstance(p, (tuple, list)):
        return sum(_param_flops(x) for x in p)
    return 0.0


def count_conv_dot_flops(fn, *args, **kwargs) -> float:
    """Total matmul+conv FLOPs of one call of ``fn`` on ``args``.

    ``args`` may be concrete arrays or ``jax.ShapeDtypeStruct``s — tracing
    never touches a device, so this is free on remote-TPU backends.  Scan
    bodies are multiplied by trip count; ``while`` bodies are charged once.
    """
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _jaxpr_flops(jaxpr.jaxpr)
