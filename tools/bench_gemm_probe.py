"""Follow-up GEMM/conv shape probes for the conv3 redesign decision."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax

ITERS = 20


def fence(x):
    float(jnp.asarray(x).ravel()[0])


def timed_loop(op, x, iters=ITERS, reps=3):
    @jax.jit
    def loop(x):
        return lax.fori_loop(0, iters, lambda i, y: op(y), x)

    fence(loop(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def report(tag, dt, flops):
    print(f"{tag:52s} {dt * 1e3:8.2f} ms   {flops / dt / 1e12:7.1f} TFLOP/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16

    # transposed conv GEMM: out^T[b, co, p] = W[co, k] @ patches[b, k, p]
    w_t = jax.random.normal(key, (48, 432), bf16)
    back_t = jax.random.normal(key, (432, 48), bf16)
    p_t = jax.random.normal(key, (64, 432, 4096), bf16)

    def op_t(y):
        o = jnp.einsum("ok,bkp->bop", w_t, y, preferred_element_type=bf16)
        return jnp.einsum("ko,bop->bkp", back_t, o, preferred_element_type=bf16)

    report("transposed [48x432]@[b64,432,4096] rt", timed_loop(op_t, p_t),
           2 * 2 * 64 * 48 * 432 * 4096)

    # row-major conv GEMM per plane: [b, p, k] @ [k, co]
    w_n = jax.random.normal(key, (432, 48), bf16)
    back_n = jax.random.normal(key, (48, 432), bf16)
    p_n = jax.random.normal(key, (64, 4096, 432), bf16)

    def op_n(y):
        o = jnp.einsum("bpk,ko->bpo", y, w_n, preferred_element_type=bf16)
        return jnp.einsum("bpo,ok->bpk", o, back_n, preferred_element_type=bf16)

    report("row-major [b64,4096,432]@[432x48] rt", timed_loop(op_n, p_n),
           2 * 2 * 64 * 48 * 432 * 4096)

    # qkv projection shape: [2M, 48] @ [48, 384]
    a = jax.random.normal(key, (2 * 1024 * 1024, 48), bf16)
    w_q = jax.random.normal(key, (48, 384), bf16)
    back_q = jax.random.normal(key, (384, 48), bf16)

    def op_q(y):
        o = jnp.dot(y, w_q, preferred_element_type=bf16)
        return jnp.dot(o, back_q, preferred_element_type=bf16)

    report("qkv [2M x 48]@[48x384] rt", timed_loop(op_q, a),
           2 * 2 * 2 * 1024 * 1024 * 48 * 384)

    # lane-rich conv: 48 -> 384 at 64^3 (the "wide-out conv" ceiling)
    B = 8
    x = jax.random.normal(key, (B, 64, 64, 64, 48), bf16)
    w3 = jax.random.normal(key, (3, 3, 3, 48, 384), bf16)
    wb = jax.random.normal(key, (1, 1, 1, 384, 48), bf16)

    def conv_wide(y):
        o = lax.conv_general_dilated(y, w3, (1, 1, 1), "SAME",
                                     dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return lax.conv_general_dilated(o, wb, (1, 1, 1), "SAME",
                                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fl = 2 * B * 64 ** 3 * (27 * 48 * 384 + 384 * 48)
    report("conv3 64^3 48->384 + 1x1 back", timed_loop(conv_wide, x), fl)

    # conv3 in s2d domain with dense 3^3 384->384 patch kernel (8x FLOPs of
    # the fine conv it would replace)
    xs = jax.random.normal(key, (B, 32, 32, 32, 384), bf16)
    wsp = jax.random.normal(key, (3, 3, 3, 384, 384), bf16)

    def conv_s2d3(y):
        return lax.conv_general_dilated(y, wsp, (1, 1, 1), "SAME",
                                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fl = 2 * B * 32 ** 3 * 27 * 384 * 384
    report("conv3-s2d 32^3 384->384 [own FLOPs]", timed_loop(conv_s2d3, xs), fl)

    # conv5 in s2d domain (exact conv7 patch kernel size)
    ws5 = jax.random.normal(key, (5, 5, 5, 144, 384), bf16)
    xs5 = jax.random.normal(key, (B, 32, 32, 32, 144), bf16)

    def conv_s2d5(y):
        o = lax.conv_general_dilated(y, ws5, (1, 1, 1), "SAME",
                                     dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return o[..., :144]

    fl = 2 * B * 32 ** 3 * 125 * 144 * 384
    report("conv5-s2d 32^3 144->384 (conv7 exact) [own]", timed_loop(conv_s2d5, xs5), fl)

    # deeper stages in s2d form: 32^3 c48 -> 16^3 c384
    xs2 = jax.random.normal(key, (B, 16, 16, 16, 384), bf16)
    ws2 = jax.random.normal(key, (3, 3, 3, 384, 384), bf16)

    def conv_s2d_32(y):
        return lax.conv_general_dilated(y, ws2, (1, 1, 1), "SAME",
                                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fl = 2 * B * 16 ** 3 * 27 * 384 * 384
    report("conv3-s2d 16^3 384->384 (stage1 equiv) [own]", timed_loop(conv_s2d_32, xs2), fl)


if __name__ == "__main__":
    main()
