"""Named timers with device synchronization + rolling statistics.

TPU re-architecture of utils/timing.py:14-146: the reference brackets
regions with torch.cuda.synchronize(); here the stop() call blocks on a
provided JAX array (block_until_ready) — the only correct way to time
dispatched XLA work.  Keeps <= `max_samples` rolling samples, reports a
trimmed mean + median, and serializes to JSON like the reference's
snapshot files.  For deep kernel analysis use jax.profiler traces
(`TimingRegistry.trace` wraps start_trace/stop_trace).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class Timer:
    def __init__(self, name: str, max_samples: int = 500):
        self.name = name
        self.max_samples = max_samples
        self.samples = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, block_on=None) -> float:
        """Ends the region; `block_on` (any jax array/pytree) is waited on
        first so dispatched device work is included."""
        if block_on is not None:
            jax.block_until_ready(block_on)
        assert self._t0 is not None, f"timer {self.name} not started"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.samples.append(dt)
        if len(self.samples) > self.max_samples:
            self.samples = self.samples[-self.max_samples:]
        return dt

    def trimmed_mean(self, trim: float = 0.1) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        k = int(len(s) * trim)
        trimmed = s[k: len(s) - k] or s
        return sum(trimmed) / len(trimmed)

    def median(self) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        return s[len(s) // 2]

    def summary(self) -> Dict[str, float]:
        return {
            "count": len(self.samples),
            "mean": self.trimmed_mean(),
            "median": self.median(),
            "last": self.samples[-1] if self.samples else 0.0,
        }


class TimingRegistry:
    """Named-timer registry + JSON snapshot (utils/timing.py:109-146)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.timers: Dict[str, Timer] = {}

    def timer(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name)
        return self.timers[name]

    @contextlib.contextmanager
    def region(self, name: str, block_on_fn=None):
        """Context manager; pass block_on_fn() -> arrays to sync on exit."""
        if not self.enabled:
            yield
            return
        t = self.timer(name)
        t.start()
        try:
            yield
        finally:
            t.stop(block_on_fn() if block_on_fn else None)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        return {k: t.summary() for k, t in self.timers.items()}

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.snapshot(), f, indent=2)

    @contextlib.contextmanager
    def trace(self, logdir: str):
        """jax.profiler trace for deep kernel analysis."""
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
