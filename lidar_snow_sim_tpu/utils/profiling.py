"""Tracing, stage timers and throughput counters.

The reference has no profiling beyond tqdm bars (SURVEY.md §5); the rebuild's
observability contract is: per-stage wall timers, scans/sec / points/sec
counters (the BASELINE metrics), and optional XLA device traces via
`jax.profiler` for TensorBoard.

Usage:
    prof = StageProfiler()
    with prof.stage("augment"):
        out = step(batch)
        jax.block_until_ready(out)
    prof.count("scans", batch_size)
    print(prof.report())

    with device_trace("/tmp/trace"):   # opens in TensorBoard / Perfetto
        step(batch)
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageProfiler:
    """Accumulating wall-clock stage timers + named throughput counters."""

    def __init__(self):
        self.times = defaultdict(float)
        self.calls = defaultdict(int)
        self.counters = defaultdict(float)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        try:
            yield self
        finally:
            self.times[name] += time.perf_counter() - t
            self.calls[name] += 1

    def count(self, name: str, inc: float = 1.0):
        self.counters[name] += inc

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rate(self, name: str, per_stage: str | None = None) -> float:
        """counter / (stage time | total elapsed) — e.g. scans/sec."""
        denom = self.times[per_stage] if per_stage else self.elapsed
        return self.counters[name] / max(denom, 1e-12)

    def report(self) -> dict:
        total = self.elapsed
        return {
            "elapsed_s": round(total, 3),
            "stages": {
                k: {
                    "s": round(v, 4),
                    "calls": self.calls[k],
                    "pct": round(100 * v / max(total, 1e-12), 1),
                }
                for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])
            },
            "counters": dict(self.counters),
            "rates_per_s": {
                k: round(v / max(total, 1e-12), 2)
                for k, v in self.counters.items()
            },
        }

    def __str__(self):
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace (TensorBoard `profile` plugin / Perfetto).

    No-op fallback if the installed jax lacks profiler support.
    """
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named region inside a traced program (shows up on the XLA timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
