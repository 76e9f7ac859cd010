"""A/B the narrow 3³ convs' BACKWARD: can a phase-fat wgrad win training?

VERDICT r3 #3(b): the r3 train audit (docs/roofline.md) puts ~94 ms/step in
tuple-output fusions, of which the `[3,3,3,·,48]` wgrads (~2.5 ms each) are
the conv part — C_out = 48 fills only 48 of the MXU's 128 lanes, while the
*init* conv's phase-fat wgrad (enlarged kernel, 8·C_out lanes) measured
~49 TF/s.  This tool measures, per flagship conv class, the fwd+bwd chain
slope of:

- ``direct``   — plain `lax.conv_general_dilated`, autodiff
- ``packed``   — z2-packed form (the shipped forward for 48→48@64³), autodiff
- ``fat``      — phase-fat form end-to-end, autodiff
- ``mixed``    — `jax.custom_vjp`: shipped forward + its dgrad, but the
  **wgrad in the phase-fat formulation** (autodiff of `fat_conv3d` w.r.t. the
  weight only; the unused fat forward primal is DCE'd by XLA).  Same math —
  the fat conv is an exact reformulation — so gradients agree to
  reassociation tolerance.

Chain-slope method as in tools/bench_fat_conv_bwd.py: jit a fori_loop of N
dependent value_and_grad steps (w.r.t. BOTH x and w — training needs dgrad
too), subtract the 1-step run, divide.

Usage: python tools/bench_conv3_bwd.py [--loops 8]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax


def _fence(x):
    float(jnp.asarray(x).astype(jnp.float32).ravel()[0])


def direct_conv(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def make_mixed(fwd_fn, wgrad_form):
    """custom_vjp: ``fwd_fn`` forward + dgrad, ``wgrad_form`` for dw only."""

    @jax.custom_vjp
    def conv(x, w):
        return fwd_fn(x, w)

    def fwd(x, w):
        return fwd_fn(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        _, vjp_x = jax.vjp(lambda xx: fwd_fn(xx, w), x)
        (dx,) = vjp_x(dy)
        # wgrad through the lane-filled formulation; its forward primal is
        # unused and DCE'd under jit
        _, vjp_w = jax.vjp(lambda ww: wgrad_form(x, ww), w)
        (dw,) = vjp_w(dy)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=8)
    ap.add_argument("--classes", default=None,
                    help="comma list like b4s64c48o48,b4s64c96o48")
    args = ap.parse_args()

    from flowtrain_stochastic_interpolation_tpu.ops.fat_conv import fat_conv3d
    from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import (
        packed_conv3d,
        use_packed_conv,
    )

    # flagship train classes (b4 micro-batch, uncond 64³):
    #   48→48 @ 64³  — the dominant Block conv (packed ships the forward)
    #   96→48 @ 64³  — up-path concat convs (the audit's 2.5 ms wgrads)
    #   96→96 @ 32³  — stage-1 Block convs (direct ships)
    classes = [
        dict(b=4, s=64, ci=48, co=48),
        dict(b=4, s=64, ci=96, co=48),
        dict(b=4, s=32, ci=96, co=96),
    ]
    if args.classes:
        classes = []
        for tok in args.classes.split(","):
            m = re.match(r"b(\d+)s(\d+)c(\d+)o(\d+)$", tok)
            if m is None:
                raise SystemExit(
                    f"bad class token {tok!r} (expected b<B>s<S>c<Cin>o<Cout>)"
                )
            classes.append(dict(b=int(m.group(1)), s=int(m.group(2)),
                                ci=int(m.group(3)), co=int(m.group(4))))

    for cls in classes:
        b, s, ci, co = cls["b"], cls["s"], cls["ci"], cls["co"]
        shipped_packed = use_packed_conv((b, s, s, s), ci, co, 3)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, s, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co),
                              jnp.float32) * 0.05
        shipped = packed_conv3d if shipped_packed else direct_conv

        forms = {
            "direct": direct_conv,
            "packed": packed_conv3d,
            "fat": lambda xx, ww: fat_conv3d(xx, ww.astype(xx.dtype)),
            "mixed": make_mixed(
                shipped, lambda xx, ww: fat_conv3d(xx, ww.astype(xx.dtype))
            ),
        }

        print(f"== b{b} {s}³ {ci}→{co} (shipped fwd: "
              f"{'packed' if shipped_packed else 'direct'}) ==", flush=True)
        results = {}
        for name, f in forms.items():
            def loss(w_, x_):
                return f(x_, w_).astype(jnp.float32).mean()

            grad = jax.value_and_grad(loss, argnums=(0, 1))

            def chain(n):
                @jax.jit
                def run(w_, x_):
                    def body(i, carry):
                        w0, x0, acc = carry
                        v, (gw, gx) = grad(w0, x0)
                        return (w0 - 1e-6 * gw,
                                x0 - 1e-6 * gx.astype(x0.dtype), acc + v)
                    _, _, acc = lax.fori_loop(0, n, body, (w_, x_, 0.0))
                    return acc
                return run

            try:
                r1, rn = chain(1), chain(args.loops)
                _fence(r1(w, x)); _fence(rn(w, x))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter(); _fence(r1(w, x))
                    t1 = time.perf_counter(); _fence(rn(w, x))
                    t2 = time.perf_counter()
                    ts.append(((t2 - t1) - (t1 - t0)) / (args.loops - 1) * 1e3)
                ms = sorted(ts)[1]
            except Exception as exc:
                print(f"  {name:>7}: FAILED {type(exc).__name__}: {exc!s:.80}",
                      flush=True)
                continue
            results[name] = ms
            print(f"  {name:>7}: {ms:8.2f} ms/fwd+bwd", flush=True)
        base = results.get("packed" if shipped_packed else "direct")
        if base:
            for name, ms in results.items():
                print(f"  {name:>7} vs shipped: {base / ms:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
