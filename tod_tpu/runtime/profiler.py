"""Tracing / profiling utilities.

Replaces the reference's ad-hoc timers (``Instant::now`` around invoke printing
"eval time: {}μs", src/yolact.rs:160-164; the unreachable fps counter,
src/scene.rs:112-116) with real instrumentation: per-stage wall timers with
explicit device sync, percentile latency stats, an FPS meter, and a
``jax.profiler`` trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self, window: int = 512):
        self.samples: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a block; ``sync`` (e.g. a jax array or pytree) is
        block_until_ready'd before the clock stops so device work is counted."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.samples[name].append(seconds)

    def stats(self, name: str) -> dict:
        xs = np.asarray(self.samples[name], np.float64)
        if xs.size == 0:
            return {"n": 0}
        return {
            "n": int(xs.size),
            "mean_ms": float(xs.mean() * 1e3),
            "min_ms": float(xs.min() * 1e3),
            "p50_ms": float(np.percentile(xs, 50) * 1e3),
            "p90_ms": float(np.percentile(xs, 90) * 1e3),
            "p99_ms": float(np.percentile(xs, 99) * 1e3),
            "max_ms": float(xs.max() * 1e3),
        }

    def summary(self) -> dict:
        return {k: self.stats(k) for k in self.samples}

    def reset(self) -> None:
        """Drop all samples (bench sweeps re-use one Engine across settings)."""
        self.samples.clear()


class FPSMeter:
    """Frames-per-second over a sliding window (the working version of the
    reference's every-60-frames print)."""

    def __init__(self, window: int = 120):
        self.times: deque = deque(maxlen=window)

    def tick(self) -> None:
        self.times.append(time.perf_counter())

    @property
    def fps(self) -> float:
        if len(self.times) < 2:
            return 0.0
        dt = self.times[-1] - self.times[0]
        return (len(self.times) - 1) / dt if dt > 0 else 0.0


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
