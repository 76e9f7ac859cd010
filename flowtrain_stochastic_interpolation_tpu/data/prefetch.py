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
    Closing/abandoning the iterator (``break``, ``gen.close()``, one-batch
    consumers like the pre-train smoke) stops the producer promptly: every
    ``put`` is a timed poll against a stop flag, so the thread can never
    stay blocked generating batches nobody will read.  The producer is also
    a daemon, so even an un-closed iterator cannot hang interpreter shutdown.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Put with stop-polling; False when the consumer has gone away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in it:
                if not _put(item):
                    return
        except BaseException as exc:  # surfaced on the consumer side
            err.append(exc)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # GeneratorExit / break: unblock + stop the producer


def parallel_map_batches(
    load_item: Callable[[int], T],
    indices_per_batch: Sequence[Sequence[int]],
    stack: Callable[[Sequence[T]], T],
    num_workers: int = 8,
    depth: int = 2,
) -> Iterator[T]:
    """Yield stacked batches with per-item parallelism and batch prefetch.

    ``load_item(idx)`` runs on a ``num_workers``-thread pool; whole batches
    are assembled ahead of the consumer up to ``depth`` deep.  Closing the
    iterator cancels queued work instead of letting it compete with training
    for host CPU.
    """
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        def batches():
            for idxs in indices_per_batch:
                yield stack(list(pool.map(load_item, idxs)))

        yield from prefetch(batches(), depth=depth)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
