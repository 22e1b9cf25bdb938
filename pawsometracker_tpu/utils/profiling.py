"""Profiling hooks around the scan and decode queue (SURVEY.md §5).

The reference has no instrumentation; here ``jax.profiler`` traces are exposed
so the device scan and the host decode pipeline can be inspected in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the trace timeline (host + device)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Tiny wall-clock section timer for host-side pipeline accounting."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
