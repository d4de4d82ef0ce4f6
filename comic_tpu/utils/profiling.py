"""Profiling and throughput tracing.

The reference's only observability is wall-clock examples/sec summaries and
infer_speed.txt (SURVEY.md §5). Here we add real device tracing:
`StepTracer` captures a jax.profiler trace window of training-loop
iterations (config.profile_dir; the examples/sec counters live inline in
the train loops themselves).
"""

from __future__ import annotations

from typing import Optional


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
