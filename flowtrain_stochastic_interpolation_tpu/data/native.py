"""ctypes bindings for the native C++ geology generator (``native/geogen_native.cpp``).

Host-side data pipeline: on a real TPU VM the host cores generate next
batches concurrently with device steps (the reference's 16 dataloader
workers, ``model_train_inference.py:255-260``, done natively).  Auto-builds
the shared library with the repo Makefile on first use; falls back cleanly
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgeogen_native.so"))

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native generator; None when unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.geogen_generate_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.geogen_generate_batch.restype = None
        lib.geogen_abi_version.restype = ctypes.c_int
        assert lib.geogen_abi_version() == 1
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def generate_batch(
    batch: int,
    shape: Tuple[int, int, int],
    n_categories: int = 15,
    seed: int = 0,
    n_threads: int = 0,
) -> np.ndarray:
    """``[batch, X, Y, Z]`` int32 volumes from the native generator."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native generator not available (no compiler?)")
    x, y, z = shape
    out = np.empty((batch, x, y, z), dtype=np.int32)
    lib.geogen_generate_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        batch, x, y, z, n_categories, ctypes.c_uint64(seed), n_threads,
    )
    return out


class NativeGeoDataset:
    """``batches``-API dataset over the native generator with double-buffered
    prefetch: the next host batch is generated on a worker thread while the
    device consumes the current one."""

    def __init__(
        self,
        model_resolution: Tuple[int, int, int] = (64, 64, 64),
        model_bounds=None,
        dataset_size: int = 10_000,
        n_categories: int = 15,
        seed: int = 0,
    ):
        if not native_available():
            raise RuntimeError("native generator not available")
        self.model_resolution = tuple(model_resolution)
        self.dataset_size = dataset_size
        self.n_categories = n_categories
        self.seed = seed

    def __len__(self) -> int:
        return self.dataset_size

    def __getitem__(self, idx: int) -> np.ndarray:
        return generate_batch(
            1, self.model_resolution, self.n_categories, self.seed * 1_000_003 + idx
        )[0]

    def batches(self, batch_size: int, epoch: int = 0) -> Iterator[np.ndarray]:
        n_batches = max(self.dataset_size // batch_size, 1)
        base = (self.seed * 1_000_003 + epoch) * 1_000_003

        result: dict = {}

        def produce(i: int):
            result[i] = generate_batch(
                batch_size, self.model_resolution, self.n_categories, base + i
            )

        thread = threading.Thread(target=produce, args=(0,))
        thread.start()
        for i in range(n_batches):
            thread.join()
            batch = result.pop(i)
            if i + 1 < n_batches:
                thread = threading.Thread(target=produce, args=(i + 1,))
                thread.start()
            yield batch
