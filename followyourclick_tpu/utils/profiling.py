"""Profiling and throughput harnesses.

Behavior spec: the reference's only perf tooling is wall-clock timing around
the sampling loop (scripts/inference.py:271,424) and mmflow's FPS benchmark
(``mmflow/tools/benchmark.py:14-50``: warmup iterations, timed iterations,
images/s). This module adds what the reference lacks (SURVEY.md §5.1): a
``jax.profiler`` trace context for real device profiles, a stage timer, and
an ``fps_benchmark`` that forces device completion per iteration.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; device-synchronising."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / self.counts[name], 4),
            }
            for name in self.totals
        }


def fps_benchmark(
    fn: Callable[[Any], Any],
    inputs: Iterable[Any],
    warmup: int = 5,
    max_iter: int = 50,
    log_interval: int = 10,
    log: Optional[Callable[[str], None]] = print,
) -> float:
    """mmflow tools/benchmark.py:14-50 semantics: skip ``warmup`` iters, time
    the next ``max_iter``, report a running average, return final FPS. Each
    iteration blocks on the result so device work is fully counted."""
    num = 0
    pure_time = 0.0
    fps = 0.0
    for i, batch in enumerate(inputs):
        start = time.perf_counter()
        out = fn(batch)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - start
        if i >= warmup:
            pure_time += elapsed
            num += 1
            if num % log_interval == 0 and log is not None:
                log(f"Done item [{num:3}/{max_iter}], "
                    f"fps: {num / pure_time:.1f} items/s")
        if num >= max_iter:
            break
    if num:
        fps = num / pure_time
        if log is not None:
            log(f"Overall fps: {fps:.1f} items/s")
    return fps
