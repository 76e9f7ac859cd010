"""Diagnose the persistent-compilation-cache behaviour on this backend.

VERDICT r3 weak #2: `.jax_cache` held only small CPU-op entries; the flagship
TPU executables were absent, so every fresh process paid a full remote (axon)
compile.  This probe answers, with logging evidence, WHY:

- does `put` run at all for TPU executables (or does the axon PJRT plugin
  fail `executable.serialize()`)?
- if entries land, does a second process `get` them (and how fast is the
  warm "compile")?

Usage:
    python tools/probe_cache.py write   # phase 1: compile + attempt cache put
    python tools/probe_cache.py read    # phase 2 (fresh process): timed get
    python tools/probe_cache.py both    # runs read in a subprocess after write
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import time

CACHE_DIR = "/tmp/probe_jax_cache"


def build_and_time():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # surface every cache decision
    logging.basicConfig(level=logging.DEBUG, stream=sys.stderr,
                        format="%(name)s: %(message)s")
    for name in ("jax._src.compilation_cache", "jax._src.compiler",
                 "jax._src.cache_key"):
        logging.getLogger(name).setLevel(logging.DEBUG)

    @jax.jit
    def f(x, w1, w2):
        for _ in range(4):
            x = jnp.tanh(x @ w1) @ w2
        return x.sum()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (512, 1024), jnp.bfloat16)
    w1 = jax.random.normal(key, (1024, 2048), jnp.bfloat16)
    w2 = jax.random.normal(key, (2048, 1024), jnp.bfloat16)
    t0 = time.perf_counter()
    float(f(x, w1, w2))
    dt = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} first-call {dt:.2f}s",
          file=sys.stderr)
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "write":
        import shutil

        shutil.rmtree(CACHE_DIR, ignore_errors=True)
        dt = build_and_time()
        entries = sorted(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else []
        print(f"WRITE: compile {dt:.2f}s; cache entries: {len(entries)}")
        for e in entries:
            sz = os.path.getsize(os.path.join(CACHE_DIR, e))
            print(f"  {e[:32]}… {sz} bytes")
    elif mode == "read":
        dt = build_and_time()
        print(f"READ: warm-process call {dt:.2f}s")
    else:
        here = os.path.abspath(__file__)
        subprocess.run([sys.executable, here, "write"], check=True)
        subprocess.run([sys.executable, here, "read"], check=True)


if __name__ == "__main__":
    main()
