"""Profiling hooks.

SURVEY §5: the reference has only commented-out timing probes
(``base_strategy.py:349-377``); here profiling is first-class — a
``jax.profiler`` trace context manager (view in TensorBoard/XProf or
Perfetto) plus a lightweight wall-clock section timer for host-side
phases (data loading, collation, device put).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/emmax-profile",
          host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host profile for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        overwatch.info(f"profile written to {log_dir}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in the trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class SectionTimer:
    """Accumulating host-side section timer.

    >>> timer = SectionTimer()
    >>> with timer("data"):
    ...     batch = next(loader)
    >>> timer.summary()   # {'data': {'total_s': ..., 'count': ..., 'mean_ms': ...}}
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}

    def log(self) -> None:
        for name, s in sorted(self.summary().items()):
            overwatch.info(f"[timer] {name}: {s['mean_ms']:.2f} ms avg "
                           f"x{s['count']}")
