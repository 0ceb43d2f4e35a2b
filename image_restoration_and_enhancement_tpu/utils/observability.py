"""Tracing/profiling + runtime guards (SURVEY §5.1-5.2 upgrades).

The reference has no profiling subsystem (tqdm bars + wall-clock logs only,
train_denoising.py:619, :914-920) and no sanitizers beyond a NaN/Inf loss
skip (:699-702). Here:

- `trace(logdir)`: context manager around `jax.profiler` trace capture
  (view with TensorBoard / xprof).
- `StepTimer`: step-time and throughput (images/sec) EMA counters.
- `debug_nans(enable)`: toggles jax_debug_nans for fault hunting.
- `device_memory_stats()`: per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Exponential-moving-average step timer with throughput reporting."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time: Optional[float] = None
        self.steps = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        self.steps += 1
        return self.step_time

    def throughput(self, items_per_step: int) -> Optional[float]:
        if not self.step_time:
            return None
        return items_per_step / self.step_time


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out
