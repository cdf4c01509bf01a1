"""Profiling / tracing utilities.

The reference has no profiling at all (SURVEY.md §5 — only tqdm bars). Here:
  * ``phase_timer``: wall-clock per-phase timing with a report dict,
  * ``device_trace``: ``jax.profiler`` trace context for TensorBoard/Perfetto,
  * ``annotate``: named trace region inside a traced program.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock time per named phase."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"total_s": round(self.totals[name], 4),
                   "count": self.counts[name],
                   "mean_s": round(self.totals[name] / self.counts[name], 6)}
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced computations (shows up in device traces)."""
    return jax.profiler.TraceAnnotation(name)
