"""Tracing / profiling.

The reference has only DeepSpeed wall_clock_breakdown + rank0 prints
(SURVEY §5); here: jax.profiler traces viewable in XProf/Perfetto, named
step markers, and a lightweight step timer for throughput accounting."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace: `with profile_trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_marker(name: str):
    """Named range for xprof timelines (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling throughput accounting (tokens/sec, step time percentiles)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self, tokens: int = 0) -> Optional[dict]:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self.times.append((dt, tokens))
        if len(self.times) > self.window:
            self.times.pop(0)
        total_t = sum(t for t, _ in self.times)
        total_tok = sum(n for _, n in self.times)
        steps = sorted(t for t, _ in self.times)
        return {
            "step_time_p50": steps[len(steps) // 2],
            "step_time_last": dt,
            "tokens_per_sec": total_tok / total_t if total_t else 0.0,
        }
