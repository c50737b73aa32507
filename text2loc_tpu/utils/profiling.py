"""Profiling and stage timing.

The reference's only timing is ad-hoc wall-clock prints
(/root/reference/training/coarse.py:89-101, evaluation/pipeline.py:102-132).
Here: (a) `StageTimer` gives the same per-stage wall-clock signal as a reusable
component, and (b) `profile_trace` wraps `jax.profiler` so any train/eval span
can be captured for xprof/tensorboard analysis (SURVEY.md section 5.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulating named wall-clock stages; call `report()` for a summary."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def rate(self, name: str, items: int) -> float:
        """items/sec for a stage (the reference's queries/sec print)."""
        return items / max(self.totals.get(name, 0.0), 1e-9)

    def report(self) -> str:
        lines = [
            f"{name}: {self.totals[name]:.3f}s over {self.counts[name]} calls"
            for name in sorted(self.totals)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_on(tree):
    """Block until every array in a pytree is ready (accurate timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
