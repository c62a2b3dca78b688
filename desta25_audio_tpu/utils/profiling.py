"""Tracing / profiling hooks.

The reference has no profiler instrumentation at all (SURVEY §5 "Tracing /
profiling: None"); here profiling is first-class: a JAX/xprof trace context
and named annotations usable around train steps and generate calls, plus a
lightweight step timer for throughput accounting without device syncs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock EMA of step time + derived throughputs.

    Does NOT force device syncs; callers fetch metrics at their own
    logging cadence (the async-dispatch queue hides host overhead)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._t = None
        self.step_time: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.time()
        if self._t is not None:
            dt = now - self._t
            self.step_time = (dt if self.step_time is None else
                              self.ema * self.step_time
                              + (1 - self.ema) * dt)
        self._t = now
        return self.step_time

    def throughput(self, items_per_step: float) -> Dict[str, float]:
        if not self.step_time:
            return {}
        return {
            "step_time_s": self.step_time,
            "items_per_sec": items_per_step / self.step_time,
        }
