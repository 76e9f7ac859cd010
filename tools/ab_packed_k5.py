"""A/B the k=5 packed-conv dispatch inside the full conditional train step.

One session, same synthetic batch, fenced timings — isolates the
``use_packed_conv`` kernel==5 branch from tunnel variance.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from flowtrain_stochastic_interpolation_tpu import config as cfg
from flowtrain_stochastic_interpolation_tpu.data.synthetic import synthetic_geology_batch
from flowtrain_stochastic_interpolation_tpu.ops import packed_conv
from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state
from flowtrain_stochastic_interpolation_tpu.train.steps import make_train_step

_ORIG = packed_conv.use_packed_conv


def _no_k5(shape, cin, cout, kernel):
    if kernel == 5:
        return False
    return _ORIG(shape, cin, cout, kernel)


def measure(tag: str, batch: int, steps: int = 6) -> float:
    config = cfg.conditional_64()
    config = dataclasses.replace(
        config,
        data=dataclasses.replace(config.data, batch_size=batch),
        training=dataclasses.replace(config.training, accumulate_grad_batches=1),
    )
    model, tx, state = init_train_state(config, host_init=True)
    train_step = make_train_step(model, tx, config)
    key = jax.random.PRNGKey(0)
    batch_data = synthetic_geology_batch(
        key, batch, config.data.shape, config.data.num_categories
    )
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch_data, key)
    # float() forces completion + transfer; block_until_ready alone has been
    # observed returning early on the axon tunnel platform (measured 7.8 ms
    # "steps" on a 477 ms program).
    float(metrics["train_loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(steps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch_data, k)
        float(metrics["train_loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"{tag}: median {med * 1e3:.1f} ms/step (compile {compile_s:.1f} s, "
          f"all {[f'{t*1e3:.0f}' for t in times]})", flush=True)
    return med


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    packed_conv.use_packed_conv = _no_k5
    base = measure("k5-direct ", batch)
    packed_conv.use_packed_conv = _ORIG
    pk = measure("k5-packed ", batch)
    print(f"ratio (direct/packed): {base / pk:.2f}x")
