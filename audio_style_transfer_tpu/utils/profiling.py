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


def enable_compile_cache(path: str = "/tmp/ast_tpu_xla_cache") -> None:
    """Turn on JAX's persistent compilation cache.

    The fused multi-epoch transfer programs take ~1 min to compile cold
    and seconds to reload; bench.py has always enabled this, and every CLI
    calls it at startup so repeat runs skip the compile (a cache-cold CLI
    run measured 122 s vs ~55 s warm)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


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


def summarize_xplane(trace_dir: str, top: int = 20) -> dict:
    """Aggregate a ``device_trace`` capture into per-op device-time totals.

    Parses the ``*.xplane.pb`` protobuf jax.profiler writes (no TensorBoard
    needed) and returns, per device plane, total leaf-op time grouped by op
    kind plus the ``top`` most expensive individual ops — the summary that
    drove the round-2 hot-loop optimizations (BENCH_NOTES.md: the gram
    fusion and the [B, T, 1] front-conv layout churn were found this way).

    Returns {} (with a note printed) when no xplane file or proto support
    is available; the capture itself never depends on this parser.
    """
    import collections
    import glob
    import re

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {}
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except ImportError:
            return {}

    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    out: dict = {}
    for plane in xs.planes:
        device = ("TPU" in plane.name or "GPU" in plane.name
                  or plane.name.startswith("/device"))
        if not device:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot: collections.Counter = collections.Counter()
            cnt: collections.Counter = collections.Counter()
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                tot[name] += ev.duration_ps
                cnt[name] += 1
            # whiles/conds are containers whose duration includes their
            # bodies; leaf ops are the real device work.
            leaf = {n: t for n, t in tot.items()
                    if not n.startswith(("%while", "%conditional"))}
            kinds: collections.Counter = collections.Counter()
            for n, t in leaf.items():
                m = re.match(r"%([a-zA-Z_\-]+)", n)
                kind = "pallas-custom-call" if "custom-call" in n else (
                    m.group(1) if m else n[:24])
                kinds[kind] += t
            out[plane.name] = {
                "total_leaf_ms": sum(leaf.values()) / 1e9,
                "by_kind_ms": {k: t / 1e9 for k, t in kinds.most_common()},
                "top_ops": [
                    {"name": n[:160], "total_ms": t / 1e9, "count": cnt[n],
                     "each_us": t / max(cnt[n], 1) / 1e6}
                    for n, t in sorted(leaf.items(), key=lambda kv: -kv[1])[:top]
                ],
            }
    return out
