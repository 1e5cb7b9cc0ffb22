"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
wall-clock meters — this is a first-class metrics module for the TPU build).

  * ``trace(logdir)`` — context manager around jax.profiler traces (view in
    TensorBoard / Perfetto).
  * ``PhaseTimer`` — named wall-clock phases (mining / train / eval) with a
    printable summary; the coarse-grained counterpart to device traces.
  * ``device_memory_stats()`` — HBM usage snapshot per device.
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Device + host trace around a code block."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("mining"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        lines = ["phase timings:"]
        total = sum(self.totals.values()) or 1.0
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"  {name:<16} {t:8.2f}s  ({t / total:5.1%})  x{self.counts[name]}"
            )
        return "\n".join(lines)


def device_memory_stats():
    """Per-device HBM usage, where the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = None
    return stats
