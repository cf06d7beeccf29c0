"""Tracing / profiling utilities.

The reference has no built-in tracing (SURVEY.md §5 — asv CI + snakeviz
only).  Here: lightweight per-stage wall timers with achieved-throughput
counters, and a jax.profiler wrapper producing TensorBoard-compatible
device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


class StageTimer:
    """Wall-clock per-stage timing with grid-throughput accounting.

    Usage:
        timer = StageTimer(grid_cells=n_lambda * n_depth)
        with timer.stage("plasma"):
            ...
        timer.report()
    """

    def __init__(self, grid_cells=None):
        self.grid_cells = grid_cells
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    @property
    def total(self):
        return sum(self.stages.values())

    def report(self, log=True):
        lines = []
        for name, wall in self.stages.items():
            lines.append(f"{name}: {wall:.3f}s")
        if self.grid_cells and self.total > 0:
            lines.append(
                f"throughput: {self.grid_cells / self.total:,.0f} "
                "(lambda x depth) cells/s"
            )
        text = " | ".join(lines)
        if log:
            logger.info("stage timings: %s", text)
        return dict(self.stages, total=self.total)


@contextlib.contextmanager
def device_trace(log_dir="/tmp/stardis_tpu_trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)
