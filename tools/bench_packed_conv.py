"""A/B: direct NDHWC 3³ conv vs z2-packed form (ops/packed_conv.py), on TPU.

Covers every 3³ conv shape class in the flagship UNets (dim=48,
mults (1,1,2,3,4) uncond / (1,2,2,3,4) cond — reference architecture
/root/reference/src/flowtrain/models/unet_attn_3d.py:222-278) at train batch
(b8) plus the 128³ b1 sampling case.  Sets the dispatch rule in
``ops.packed_conv.use_packed_conv``.

Timing uses the chain-slope idiom (r convs in one scanned program, slope of
wall time vs r) because per-dispatch overhead through the axon tunnel is
~25 ms — single-dispatch timing measures only the floor.

Run on the real chip:  python tools/bench_packed_conv.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import packed_conv3d

# (B, S, Cin, Cout[, k]) — S³ grid; every flagship 3³ conv class with S >= 8,
# plus the conditional EmbedATb k=5 tower classes (docs/roofline.md open lead)
SHAPES = [
    (8, 64, 48, 48),    # dominant: level-0 block convs
    (8, 64, 96, 48),    # up-path concat conv at level 0
    (8, 32, 48, 48),    # level-1 blocks (uncond)
    (8, 32, 96, 96),    # level-1 blocks (cond)
    (8, 32, 96, 48),    # level-1 up concat (uncond)
    (8, 32, 192, 96),   # level-1 up concat (cond)
    (8, 16, 96, 96),    # level-2 blocks
    (8, 16, 48, 96),    # level-2 down entry (uncond)
    (8, 16, 192, 96),   # level-2 up concat
    (8, 8, 144, 144),   # level-3 blocks
    (8, 8, 288, 144),   # level-3 up concat
    (1, 128, 48, 48),   # 128³ sampling
    (1, 128, 96, 48),
    (4, 64, 48, 48),    # train micro-batch (b4 × accum-2) level-0 blocks
    (4, 64, 96, 48),    # train micro-batch up concat
    (2, 64, 48, 48),    # conditional train micro-batch (b2 × accum-4)
    (16, 64, 48, 48),   # b16 sampling saturation row
    (1, 64, 48, 48),    # single-sample inference
    # EmbedATb k=5 tower convs (cond flagship: data_channels=15, dim=48).
    # k=5 packs 5 z-taps into 3 packed taps ⇒ only 1.2× structural-zero FLOPs.
    (2, 64, 15, 48, 5),   # downs_0/ups_4 embed conv1, train micro-batch
    (2, 64, 48, 48, 5),   # downs_0/ups_4 embed conv2
    (4, 64, 15, 48, 5),
    (4, 64, 48, 48, 5),
    (8, 64, 15, 48, 5),   # conditional sampling batch
    (8, 64, 48, 48, 5),
    (2, 32, 48, 48, 5),   # downs_1/ups_3 embed (32³ lost for k=3; re-check)
    (1, 64, 15, 48, 5),   # single-sample conditional inference
    (1, 64, 48, 48, 5),
]


def fence(x):
    for leaf in jax.tree.leaves(x):
        float(jnp.asarray(leaf).sum())


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _chain(conv, r, cin, cout):
    def step(z, _):
        y = conv(z)
        if cout != cin:
            reps = -(-cin // cout)
            y = jnp.concatenate([y] * reps, axis=-1)[..., :cin]
        return y * 0.5, None

    def run(x, w):
        z, _ = jax.lax.scan(step, x, None, length=r)
        return z

    return run


def bench_rate(conv, x, w, cin, cout, flops_per, grad=False, r_hi=12, r_lo=4):
    def make(r):
        chain = _chain(lambda z: conv(z, w), r, cin, cout)
        if not grad:
            return lambda x_, w_: chain(x_, w_)

        def loss(x_, w_):
            return jnp.sum(chain(x_, w_).astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0,))

    t_hi = timeit(jax.jit(make(r_hi)), x, w)
    t_lo = timeit(jax.jit(make(r_lo)), x, w)
    per = max(t_hi - t_lo, 1e-9) / (r_hi - r_lo)
    return flops_per / per / 1e12, per


def main():
    # optional filter: python tools/bench_packed_conv.py 4,64 2,64  → only
    # shape rows whose (B, S) prefix matches one of the args
    prefixes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    shapes = [sh for sh in SHAPES
              if not prefixes or any(sh[:len(p)] == p for p in prefixes)]
    print(f"{'shape':>22} | {'direct fwd':>16} | {'packed fwd':>16} | ratio"
          f" | {'direct f+b':>16} | {'packed f+b':>16} | ratio")
    for row in shapes:
        b, s, ci, co = row[:4]
        k = row[4] if len(row) > 4 else 3
        x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, s, ci), jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (k, k, k, ci, co), jnp.float32)
             / (k ** 3 * ci) ** 0.5).astype(jnp.bfloat16)
        # numerics check
        yd = jax.jit(direct_conv)(x, w)
        yp = jax.jit(packed_conv3d)(x, w)
        err = float(jnp.max(jnp.abs(yd.astype(jnp.float32) - yp.astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(yd.astype(jnp.float32)))) + 1e-9

        flops = 2 * b * s ** 3 * k ** 3 * ci * co
        tf_d, per_d = bench_rate(direct_conv, x, w, ci, co, flops)
        tf_p, per_p = bench_rate(packed_conv3d, x, w, ci, co, flops)
        tf_dg, per_dg = bench_rate(direct_conv, x, w, ci, co, 3 * flops, grad=True)
        tf_pg, per_pg = bench_rate(packed_conv3d, x, w, ci, co, 3 * flops, grad=True)
        print(f"{str((b, s, ci, co)):>22} |"
              f" {per_d*1e3:7.2f}ms {tf_d:5.1f}TF |"
              f" {per_p*1e3:7.2f}ms {tf_p:5.1f}TF | {per_d/per_p:5.2f}"
              f" | {per_dg*1e3:7.2f}ms {tf_dg:5.1f}TF |"
              f" {per_pg*1e3:7.2f}ms {tf_pg:5.1f}TF | {per_dg/per_pg:5.2f}"
              f" | rel.err {err/sc:.1e}")


if __name__ == "__main__":
    main()
