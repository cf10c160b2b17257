"""Wall-clock timing + device profiling utilities.

API-compatible replacement for the reference Timer (utils/utils.py:17-126)
for host-side timing, plus hooks into jax.profiler for device traces — the
TPU answer to the reference's print-based instrumentation (SURVEY.md §5).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

import jax


class Timer:
    """Context-manager wall-clock timer with interval accumulation."""

    _intervals: Dict[str, List[float]] = defaultdict(list)

    def __init__(self, name: str = "timer", noprint: bool = False) -> None:
        self.name = name
        self.noprint = noprint
        self._start = 0.0
        self.interval = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.interval = time.perf_counter() - self._start
        Timer._intervals[self.name].append(self.interval)
        if not self.noprint:
            print(self.report())

    @property
    def intervals(self) -> List[float]:
        return Timer._intervals[self.name]

    @property
    def cum_time(self) -> float:
        return sum(self.intervals)

    @property
    def mean_time(self) -> float:
        iv = self.intervals
        return sum(iv) / len(iv) if iv else 0.0

    def report(self) -> str:
        iv = self.intervals
        return (
            f"{self.name}: last {self.interval * 1000:.2f} ms | "
            f"n={len(iv)} mean {self.mean_time * 1000:.2f} ms "
            f"cum {self.cum_time * 1000:.1f} ms"
        )

    @classmethod
    def reset(cls) -> None:
        cls._intervals = defaultdict(list)


@contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
