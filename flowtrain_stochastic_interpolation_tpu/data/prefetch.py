"""Host-side batch prefetching for generator-backed datasets.

The reference overlaps data generation with training via 16 DataLoader
worker processes (``model_train_inference.py:255-260``).  The TPU-native
equivalent: a bounded background queue that keeps ``depth`` batches ready
while the device consumes the current one, plus a thread pool that
parallelises per-sample generation inside a batch (GeoGen/numpy release the
GIL in their hot loops).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(it: Iterator[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``it`` on a background thread, keeping ``depth`` items queued.

    Exceptions raised by the producer are re-raised at the consuming site.
    The producer thread is a daemon, so abandoning the iterator (e.g. a
    ``break``) cannot hang interpreter shutdown.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    err: list = []

    def produce():
        try:
            for item in it:
                q.put(item)
        except BaseException as exc:  # surfaced on the consumer side
            err.append(exc)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def parallel_map_batches(
    load_item: Callable[[int], T],
    indices_per_batch: Sequence[Sequence[int]],
    stack: Callable[[Sequence[T]], T],
    num_workers: int = 8,
    depth: int = 2,
) -> Iterator[T]:
    """Yield stacked batches with per-item parallelism and batch prefetch.

    ``load_item(idx)`` runs on a ``num_workers``-thread pool; whole batches
    are assembled ahead of the consumer up to ``depth`` deep.
    """
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        def batches():
            for idxs in indices_per_batch:
                yield stack(list(pool.map(load_item, idxs)))

        yield from prefetch(batches(), depth=depth)
    finally:
        pool.shutdown(wait=False)
