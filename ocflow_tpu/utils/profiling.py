"""Step timing + jax.profiler hooks (the reference has none — SURVEY.md §5).

``StepTimer`` measures wall-clock per step and images/sec, with a warning:
under the axon relay, ``block_until_ready`` is NOT a true sync — callers that
need exact device timing must fetch a value (see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._start = None
        self._images = 0

    def tick(self, batch_size: int):
        self._count += 1
        if self._count == self.warmup:
            self._start = time.perf_counter()
            self._images = 0
        elif self._count > self.warmup:
            self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._start)

    @property
    def steps_per_sec(self) -> float:
        if self._start is None:
            return 0.0
        return (self._count - self.warmup) / (time.perf_counter() - self._start)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
