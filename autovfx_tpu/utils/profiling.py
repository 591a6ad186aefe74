"""Tracing / profiling utilities.

The reference's observability is wall-clock prints + wandb iter_time
(SURVEY §5); the TPU equivalents here are jax.profiler traces plus
light-weight stage timers that block on device completion.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Accumulating per-stage wall timers (device-synchronized)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace capture (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
