"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference only wall-clocks solve() into result.json; the TPU build adds
per-stage timers plus an optional jax.profiler trace around a solve so
kernels can be inspected in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage (device-synchronized)."""

    def __init__(self, sync: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        t0 = time.perf_counter()
        yield
        if self.sync:
            for a in sync_arrays:
                jax.block_until_ready(a)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in sorted(self.totals.items())}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
