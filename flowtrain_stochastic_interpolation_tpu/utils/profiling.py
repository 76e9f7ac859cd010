"""Tracing / profiling helpers (SURVEY.md §5 "tracing/profiling").

The reference profiles ad-hoc with ``torch.profiler`` + wall-clock prints
(``unet_attn_3d_cond.py:831-846``, ``model_train_inference.py:631-658``).
TPU equivalents here:

* :func:`trace` — ``jax.profiler`` xplane trace context (view in TensorBoard
  or xprof);
* :class:`StepTimer` — honest per-step wall-clock via ``block_until_ready``
  with warmup discard and percentile summary;
* :func:`compile_time` — measures trace+compile seconds for a jitted fn
  (the reference's "first call is slow" made explicit).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out) -> None:
    """True completion fence: block, then force a scalar host readback.

    Bare ``block_until_ready`` has been observed returning at launch (not
    completion) on the axon remote-TPU tunnel; the readback of one element
    from the first array leaf is what actually waits for the device
    (BASELINE.md packed-conv 2b measurement note).
    """
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    if leaves:
        # one-element device slice → scalar transfer (not the whole array)
        float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/xplane'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync, warmup, and stats."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0

    def __call__(self, fn: Callable, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _fence(out)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return out

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps_per_sec": float(1.0 / a.mean()),
            "n": len(self.times),
        }


def compile_time(fn: Callable, *args, **kwargs) -> float:
    """Seconds spent in trace+compile+first-execution of a jitted callable."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _fence(out)
    return time.perf_counter() - t0
