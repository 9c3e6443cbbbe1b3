"""Stage timing + jax profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5 — tqdm
only); here every runner stage can be timed and optionally traced with
the jax profiler for tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class StageProfiler:
    """Wall-clock per stage + optional jax trace."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.times: Dict[str, float] = {}
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def stage(self, name: str):
        import jax
        ctx = contextlib.nullcontext()
        if self.trace_dir:
            ctx = jax.profiler.trace(self.trace_dir)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt

    def report(self) -> Dict[str, float]:
        total = sum(self.times.values())
        print("[Stage timings]")
        for k, v in sorted(self.times.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<30s} {v:8.2f}s  ({100 * v / max(total, 1e-9):.0f}%)")
        print(f"  {'TOTAL':<30s} {total:8.2f}s")
        return dict(self.times)

    def dump(self, fname: str) -> None:
        with open(fname, "w") as f:
            json.dump(self.times, f, indent=2)


GLOBAL_PROFILER = StageProfiler()


def stage(name: str):
    """Module-level convenience: `with profiler.stage("detect"): ...`"""
    return GLOBAL_PROFILER.stage(name)
