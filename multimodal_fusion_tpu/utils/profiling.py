"""Profiling utilities.

The reference's opt-in wall-clock stage profiler
(``alignment/trainer.py:88-102,442-507``) becomes a context-manager timer
with per-stage aggregation plus a hook into ``jax.profiler`` traces for real
TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Per-stage wall-clock aggregation with bottleneck ranking."""

    def __init__(self):
        self.stats: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        """Wall-clock a with-block.  To include device time of JAX work
        dispatched inside the block, call ``jax.block_until_ready`` on the
        block's outputs before it exits (a block-on-result parameter cannot
        work: the result doesn't exist at with-entry)."""
        t0 = time.perf_counter()
        yield
        self.stats[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.stats[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.stats.items():
            out[name] = {
                "mean_s": sum(vals) / len(vals),
                "total_s": sum(vals),
                "count": len(vals),
            }
        return out

    def bottleneck_ranking(self) -> list:
        return sorted(
            self.summary().items(), key=lambda kv: kv[1]["total_s"], reverse=True
        )

    def print_report(self) -> None:
        print(f"{'stage':30s} {'total_s':>10s} {'mean_s':>10s} {'count':>7s}")
        for name, s in self.bottleneck_ranking():
            print(f"{name:30s} {s['total_s']:10.3f} {s['mean_s']:10.4f} {s['count']:7d}")


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
