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


# bf16 MXU peak per chip (TFLOP/s) by TPU generation — used for the MFU
# meter; v5e (the bench chip) is 197.
PEAK_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v5lite": 197.0,
               "v4": 275.0, "v5p": 459.0, "v6e": 918.0, "v6lite": 918.0}


def dense_forward_flops(arch: str, h: int, w: int, num_classes: int = 4,
                        decoder: str = "Unet") -> float:
    """Analytic LOGICAL FLOPs of one dense Y-Net segmentation forward at
    (h, w) input resolution: the model's conv multiply-adds ×2, counted on
    the reference architecture (stem + 4 ResNet stages + Unet decoder +
    head). Layout tricks (s2d weight transforms) that re-express the same
    math with redundant FLOPs do NOT change this number — MFU is measured
    against the work the reference model defines, so layout regressions
    can't hide behind inflated denominators.

    Reference twin: the predict_tumorbed dense eval (utils/eval.py:155-286)
    runs these same convs tile-by-tile (16× overlap at stride 128; grid
    mode FLOPs = this number × overlap)."""
    from wsiseg_tpu.models.resnet import ENCODER_SPECS, Bottleneck

    block_cls, stages = ENCODER_SPECS[arch]
    bottleneck = block_cls is Bottleneck
    e = 4 if bottleneck else 1

    mac = 0
    # stem 7×7/2, 3→64
    mac += (h // 2) * (w // 2) * 49 * 3 * 64
    # stages at /4, /8, /16, /32
    cin = 64
    for i, n in enumerate(stages):
        planes = 64 * (2 ** i)
        hw = (h // (4 * 2 ** i)) * (w // (4 * 2 ** i))
        for j in range(n):
            if bottleneck:
                cout = planes * e
                mac += hw * (cin * planes + 9 * planes * planes
                             + planes * cout)
                if j == 0:
                    mac += hw * cin * cout          # 1×1 downsample
                cin = cout
            else:
                mac += hw * 9 * (cin * planes + planes * planes)
                if j == 0 and (i > 0 or cin != planes):
                    mac += hw * cin * planes
                cin = planes
    if decoder == "Unet":
        # smp Unet decoder: channels (256, 128, 64, 32, 16), skips from
        # [c4, c3, c2, c1, None]
        ch = (256, 128, 64, 32, 16)
        skips = (256 * e, 128 * e, 64 * e, 64, 0)
        x = 512 * e
        for i, (c, s) in enumerate(zip(ch, skips)):
            hw = (h // (2 ** (4 - i))) * (w // (2 ** (4 - i)))
            mac += hw * 9 * ((x + s) * c + c * c)
            x = c
        mac += h * w * 9 * 16 * num_classes         # 3×3 seg head
    return 2.0 * mac


def detect_peak_tflops(default: float = 197.0, kind: str = None) -> float:
    """Best-effort bf16 peak for device 0 (fallback: v5e). ``kind``
    overrides the probed ``device_kind`` (for tests)."""
    if kind is None:
        import jax

        kind = getattr(jax.devices()[0], "device_kind", "")
    kind = kind.lower().replace(" ", "")
    # longest key first so 'v5litepod' wins over 'v5lite' (same value
    # today, but keeps the match deterministic as entries are added);
    # JAX reports e.g. 'TPU v5 lite' / 'TPU v6 lite' -> 'tpuv5lite'
    for key in sorted(PEAK_TFLOPS, key=len, reverse=True):
        if key in kind:
            return PEAK_TFLOPS[key]
    return default


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
