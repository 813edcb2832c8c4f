"""Stage timing and device profiling.

The reference's only progress visibility is tqdm bars (reference
activation_based.py:351, 424); SURVEY.md §5 calls out tracing/throughput
counters as a new capability for the TPU build. This module provides:

- :class:`StageTimer` — wall-clock + items/sec per pipeline stage, logged
  through the package logger and queryable as a dict (feeds bench output);
- :func:`device_trace` — a ``jax.profiler`` trace context writing a TensorBoard
  trace directory for kernel-level inspection.

Timing note: on remote/tunneled backends ``block_until_ready`` can return
early — StageTimer.stop(force=...) accepts an array to materialize instead.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

import numpy as np

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates per-stage wall-clock and throughput."""

    def __init__(self):
        self.stages: dict[str, dict] = {}

    @contextmanager
    def stage(self, name: str, items: int | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            entry = self.stages.setdefault(name, {"seconds": 0.0, "items": 0})
            entry["seconds"] += dt
            if items:
                entry["items"] += items
            per_sec = f", {items / dt:.1f} items/s" if items else ""
            logger.info(f"[stage:{name}] {dt:.3f}s{per_sec}")

    def summary(self) -> dict[str, dict]:
        out = {}
        for name, e in self.stages.items():
            out[name] = dict(e)
            if e["items"]:
                out[name]["items_per_sec"] = e["items"] / e["seconds"]
        return out


def force_materialize(tree):
    """Host-materialize every array in a pytree (honest timing barrier)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


@contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Wrote device trace to {log_dir}")
