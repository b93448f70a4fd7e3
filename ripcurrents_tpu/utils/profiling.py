"""Per-stage wall timers and jax.profiler helpers.

The reference times stages with a static-state gettimeofday diff
(ripcurrents_module.cpp:681-688) and prints totals at exit
(ripcurrents.cpp:517-524). Here timers are explicit objects, and device
work can be traced with jax.profiler for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"time spent on {name}: {total:.3f}s "
                         f"({n} calls, {total / max(n, 1) * 1e3:.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
