"""Tracing / profiling hooks (SURVEY.md §5: the reference has none — tqdm
bars only; patches/sec IS the metric for this workload).

* :class:`Throughput` — rolling patches/sec + sec/slide counters, used by
  the trainer loop and the dense-inference engine.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace for kernel-level analysis.
* :func:`device_memory_stats` — HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Throughput:
    """Rolling throughput meter: ``update(n_items)`` per step."""
    window: int = 50
    _times: List[float] = field(default_factory=list)
    _counts: List[int] = field(default_factory=list)
    total_items: int = 0
    started: float = field(default_factory=time.time)

    def update(self, n_items: int) -> None:
        now = time.time()
        self._times.append(now)
        self._counts.append(n_items)
        self.total_items += n_items
        if len(self._times) > self.window:
            self._times.pop(0)
            self._counts.pop(0)

    @property
    def rate(self) -> float:
        """items/sec over the rolling window."""
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._counts[1:]) / dt if dt > 0 else 0.0

    @property
    def mean_rate(self) -> float:
        dt = time.time() - self.started
        return self.total_items / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str, host_profile: bool = False):
    """Capture a device trace viewable in TensorBoard/XProf.

    Usage::
        with profiling.trace("/tmp/jax-trace"):
            engine.predict_slide(plan)
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=host_profile)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, int]:
    """HBM usage for one device (empty dict when the backend lacks stats)."""
    import jax

    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


@contextlib.contextmanager
def timed(label: str, log=print):
    """Wall-clock timing of a block, with device sync at the end.

    The sync dispatches a trivial computation after the block and fetches
    its value: per-device streams are FIFO, so the fetch completes only
    after all queued work (``block_until_ready`` is unreliable over this
    environment's TPU relay, and ``effects_barrier`` only waits for
    side-effecting computations)."""
    t0 = time.time()
    yield
    float(_sync_fn()())
    log(f"{label}: {time.time() - t0:.3f}s")


_SYNC = []


def _sync_fn():
    """Compile the trivial sync graph once (per-call jit(lambda) would pay
    a fresh trace+compile inside every timed window)."""
    if not _SYNC:
        import jax
        import jax.numpy as jnp
        _SYNC.append(jax.jit(lambda: jnp.zeros(())))
    return _SYNC[0]
