"""Tracing / profiling helpers (SURVEY.md §5: the reference has none —
only latency comments and tqdm; here: jax.profiler hooks + step timers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

__all__ = ["trace", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """jax.profiler trace context — view with TensorBoard / xprof."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput tracker with warmup exclusion.

    NOTE on tunneled/remote TPU platforms: wall-clock between dispatches
    understates device time; bracket measurements with a real device->host
    fetch (see bench.py) when you need honest numbers.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.items = 0
        self._t0: Optional[float] = None

    def step(self, n_items: int = 1):
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()
            self.items = 0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def items_per_sec(self) -> Optional[float]:
        if self._t0 is None or self.items == 0:
            return None
        return self.items / (time.perf_counter() - self._t0)


def device_memory_stats():
    """Per-device memory stats dict (empty when the backend lacks support)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            # CPU devices return None rather than raising — normalize to {}
            stats[str(d)] = d.memory_stats() or {}
        except Exception:
            stats[str(d)] = {}
    return stats
