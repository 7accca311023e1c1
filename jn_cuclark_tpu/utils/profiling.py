"""Profiling / tracing hooks.

The reference has wall-clock-only timing (gettimeofday around classification,
CuCLARK_hh.hh:552-563, plus DEBUG_* printf tracing).  Here:

  * `Phases` — lightweight accumulating phase timers for the engine hot path
    (scan / pack / device / format), printed by `clark-tpu classify
    --profile`
  * `trace()` — context manager wrapping `jax.profiler` so a classification
    run can be captured for xprof/tensorboard with
    `clark-tpu classify --trace-dir DIR`
"""

from __future__ import annotations

import contextlib
import threading
import time


class Phases:
    """Accumulating phase timers; updated from the engine's pipeline
    threads (dispatch worker, fetch pool), so accumulation is locked."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        with self._lock:
            self.totals[name] = self.totals.get(name, 0.0) + seconds
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = ["phase            total_s   calls   avg_ms"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<16} {tot:8.3f} {n:7d} {1000*tot/n:8.2f}")
        return "\n".join(lines)


# engine-global collector; re-assigned per run when profiling is enabled
current: Phases | None = None


@contextlib.contextmanager
def collect():
    global current
    prev = current
    current = Phases()
    try:
        yield current
    finally:
        current = prev


@contextlib.contextmanager
def maybe_phase(name: str):
    if current is None:
        yield
    else:
        with current.phase(name):
            yield


@contextlib.contextmanager
def trace(trace_dir: str | None):
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
