"""Profiling/observability helpers.

The reference's only observability is an average-FPS printout
(data_logger.py:266-286) and ad-hoc cProfile advice. Here:

* :class:`StageTimer` — per-stage wall-clock accounting with device sync;
* :func:`trace` — context manager around jax.profiler for xprof traces;
* :class:`FpsCounter` — rolling frames/sec like video_detection.py:260-268.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: object = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            c = self.counts[name]
            lines.append(f"{name:24s} {t:8.3f}s total  {t / max(c, 1) * 1e3:8.2f} ms/call  x{c}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/aprilslam_trace"):
    """xprof trace around a region: view with tensorboard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class FpsCounter:
    def __init__(self, window: int = 30):
        self.window = window
        self._n = 0
        self._t0 = time.perf_counter()
        self.fps = 0.0

    def tick(self, frames: int = 1) -> float | None:
        self._n += frames
        if self._n >= self.window:
            now = time.perf_counter()
            self.fps = self._n / (now - self._t0)
            self._n = 0
            self._t0 = now
            return self.fps
        return None
