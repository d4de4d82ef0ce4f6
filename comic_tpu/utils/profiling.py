"""Profiling and throughput tracing.

The reference's only observability is wall-clock examples/sec summaries and
infer_speed.txt (SURVEY.md §5). Here we keep those artifacts and add real
device tracing: `trace()` wraps a region with jax.profiler (TensorBoard
trace viewer format), and `Throughput` maintains the examples/sec counters
the train loops log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace of the enclosed region (no-op when log_dir is
    falsy or the profiler is unavailable on the platform)."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class Throughput:
    """Examples/sec between check-ins (train_fn.py:101-106 semantics)."""

    def __init__(self):
        self._t = time.time()
        self._n = 0

    def add(self, n: int) -> None:
        self._n += n

    def rate_and_reset(self) -> float:
        dt = time.time() - self._t
        rate = self._n / max(dt, 1e-9)
        self._t = time.time()
        self._n = 0
        return rate


class StepTracer:
    """Capture a jax.profiler trace of loop iterations [start, start+count)
    (config.profile_dir; TensorBoard trace-viewer format). Counts CALLS,
    not step values, so scan-of-K strides and resumed step counters still
    hit the window. Call `step(i)` once per loop iteration and `close()`
    on exit; both are no-ops when log_dir is falsy."""

    def __init__(self, log_dir: Optional[str], start: int = 10,
                 count: int = 3):
        self._dir = log_dir
        self._start = start
        self._stop = start + count
        self._calls = 0
        self._active = False

    def step(self, step: int) -> None:
        del step  # iteration count, not the (possibly strided) counter
        if not self._dir:
            return
        import jax

        i = self._calls
        self._calls += 1
        if not self._active and self._start <= i < self._stop:
            try:
                jax.profiler.start_trace(self._dir)
                self._active = True
            except Exception:
                self._dir = None  # profiler unavailable; stay silent
        elif self._active and i >= self._stop:
            self.close()

    def close(self) -> None:
        if self._active:
            import jax

            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            self._active = False
