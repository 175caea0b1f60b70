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


def enable_compilation_cache(path: str = "/tmp/jaxcache"):
    """Turn on JAX's persistent compilation cache.

    Remote Mosaic/XLA compiles of the big fused training programs take
    1-10 minutes through the axon relay; the persistent cache makes every
    relaunch (and every post-crash retry) skip them. Called by the CLI
    entry points (train.py / train_unsupervised.py / bench.py); library
    users opt in themselves.
    """
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even small/fast-compiling programs: the cost is disk, the win
    # is relay round trips
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
