"""Tracing / profiling helpers — a green field vs the reference (SURVEY §5:
the reference has no profiler, only icecream prints).

Wraps jax.profiler for device traces plus a lightweight host-side stage
timer that blocks on device results so numbers mean wall time, not dispatch
time.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageTimer:
    """Accumulate wall-time per named stage; device-sync aware."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """sync: optional array/pytree to block_until_ready on exit."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": round(t, 6),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * t / max(self.counts[name], 1),
                                        3)}
                for name, t in sorted(self.totals.items())}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
        return path


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
