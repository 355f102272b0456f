"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm bars (SURVEY.md §5). Here:
`trace_context` wraps a block in a jax.profiler trace (view in TensorBoard /
xprof), and `StageTimer` gives cheap wall-clock stage timings with correct
device synchronization (block_until_ready before reading the clock).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """Profile the enclosed block to `log_dir` (no-op when None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall-clock timings.

    >>> t = StageTimer()
    >>> with t.stage("segment_1"):
    ...     out = fn(x)  # timer blocks on device completion at exit
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        result_holder = {}
        yield result_holder
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        elif "result" in result_holder:
            jax.block_until_ready(result_holder["result"])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
