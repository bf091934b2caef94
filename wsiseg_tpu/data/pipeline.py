"""Host→device input pipeline: threaded prefetch with a bounded queue.

The reference's only parallelism is DataLoader worker processes + pinned
memory (utils/dataset.py:72-78). The TPU-native equivalent: a background
thread pool produces numpy batches while the device computes, with
``jax.device_put`` overlapping transfer; depth-``prefetch_depth`` bounded
queue applies backpressure.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class _Sentinel:
    pass


_DONE = _Sentinel()


def prefetch_to_device(batch_iter: Iterator, depth: int = 2,
                       device=None) -> Iterator:
    """Wrap a host batch iterator: stage batches onto device ahead of use.

    ``device`` may be a Device/Sharding (applied uniformly) or a CALLABLE
    ``batch -> staged`` for per-key sharding (e.g. spatial-parallel batches
    where images shard on (data, space) but scalars only on data)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def worker():
        try:
            for b in batch_iter:
                if callable(device):
                    staged = device(b)
                elif device is not None:
                    staged = jax.device_put(b, device)
                else:
                    staged = jax.device_put(b)
                q.put(staged)
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if isinstance(item, _Sentinel):
            if err:
                raise err[0]
            return
        yield item


class ThreadedBatcher:
    """Run a batch-producing callable on N threads, fan-in to one queue.

    General-purpose host-side fan-in for multi-source batch production
    (e.g. decoding tile batches for several slides concurrently); the
    dense-inference engine's single-slide streamed path uses
    :func:`prefetch_to_device` directly.
    """

    def __init__(self, make_iters: list[Callable[[], Iterator]],
                 depth: int = 4):
        self._iters = make_iters
        self._depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        err: list = []
        n_live = len(self._iters)
        lock = threading.Lock()

        def run(make_it):
            nonlocal n_live
            try:
                for b in make_it():
                    q.put(b)
            except BaseException as e:
                err.append(e)
            finally:
                with lock:
                    n_live -= 1
                    if n_live == 0:
                        q.put(_DONE)

        for mk in self._iters:
            threading.Thread(target=run, args=(mk,), daemon=True).start()

        while True:
            item = q.get()
            if isinstance(item, _Sentinel):
                if err:
                    raise err[0]
                return
            yield item
