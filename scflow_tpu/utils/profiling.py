"""Profiling helpers: jax.profiler traces + per-phase wall timing.

The reference has essentially no tracing (SURVEY.md §5.1); here every phase
of the hot path (render / encode / correlation / GRU loop / loss) can be
timed with `PhaseTimer` (block_until_ready sections) and full XLA traces
captured with `trace` for tensorboard.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in tensorboard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating per-phase wall timer with device synchronization.

    Usage::
        timer = PhaseTimer()
        with timer("render"):
            out = renderer(...)   # blocks on exit
        print(timer.summary())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._last_out = None

    @contextlib.contextmanager
    def __call__(self, phase: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._last_out is not None:
                jax.block_until_ready(self._last_out)
                self._last_out = None
            elif sync_value is not None:
                jax.block_until_ready(sync_value)
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def sync(self, value):
        """Register a value to block on when the phase exits."""
        self._last_out = value
        return value

    def summary(self) -> dict[str, float]:
        """Mean milliseconds per phase."""
        return {k: 1000.0 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}ms" for k, v in self.summary().items())
