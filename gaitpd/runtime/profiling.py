"""Tracing / profiling / debugging hooks.

The reference has none of these (SURVEY.md §5: progress is a print every 10
batches, fbg_fog_train.py:245-250; its only numerical guard is a NaN-logit
printout, weargait_train.py:306-309). Here:

* ``trace`` — context manager around jax.profiler for the jitted train step;
* ``StepTimer`` — windows/sec/chip counters (the headline metric);
* ``enable_nan_debug`` — jax_debug_nans toggle, the structured replacement
  for the reference's per-batch isfinite print;
* ``log_compile_times`` — logs jit cache misses (useful to prove the
  mask-is-an-operand design never recompiles across the 7 subsets).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gaitpd_trace") -> Iterator[None]:
    """jax.profiler trace around a region; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug(enable: bool = True) -> None:
    """Fail fast on non-finite values inside jitted code (replaces the
    reference's non-finite logit print, weargait_train.py:306-309)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock + windows/sec accounting for epochs/steps."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.windows = 0
        self.steps = 0

    def add(self, windows: int, steps: int = 1):
        self.windows += int(windows)
        self.steps += int(steps)

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def windows_per_sec(self) -> float:
        dt = self.elapsed
        return self.windows / dt if dt > 0 else 0.0

    def summary(self) -> dict:
        return {
            "elapsed_s": round(self.elapsed, 3),
            "steps": self.steps,
            "windows": self.windows,
            "windows_per_sec": round(self.windows_per_sec, 1),
        }


@contextlib.contextmanager
def log_compile_times() -> Iterator[None]:
    """Log every XLA compilation in the region (recompile detector)."""
    with jax.log_compiles():
        yield
