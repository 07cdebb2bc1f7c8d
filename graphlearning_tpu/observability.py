"""Tracing, profiling, and throughput counters.

The reference has no tracing/profiling subsystem (SURVEY.md §5: ad-hoc
``prog=True`` printf flags, vestigial ``clock()`` calls).  This module is
the TPU framework's observability layer:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto/TensorBoard-readable trace directory.
* :class:`Timer` — device-synchronized wall-clock timer.
* :func:`benchmark` — compile-then-measure harness for jitted functions,
  reporting wall time and derived throughput (edges/s for graph ops).
* :class:`Counters` — process-global named counters (e.g. CG iterations,
  SpMM edges processed) with a printable summary.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile the enclosed block with ``jax.profiler.trace``.

    View with TensorBoard (``tensorboard --logdir=<logdir>``) or upload the
    contained ``.perfetto-trace`` to ui.perfetto.dev."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Device-synchronized timer: ``with Timer() as t: ...; t.seconds``."""

    def __init__(self, sync=None):
        self._sync = sync

    def __enter__(self):
        self.seconds = None
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.seconds = time.perf_counter() - self._t0
        return False


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1,
              edges: Optional[int] = None, chain: bool = False):
    """Time a jittable function: compile+warm up, then ``iters`` timed runs.

    ``chain=True`` feeds each output back as the first argument (defeats
    dead-code elimination / overlapped dispatch for pure iteration kernels).
    Returns a dict with wall seconds per call and, when ``edges`` is given,
    throughput in edges/s."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    if chain:
        y = args[0]
        for _ in range(iters):
            y = fn(y, *args[1:])
        jax.block_until_ready(y)
    else:
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    result = {"seconds_per_call": dt, "iters": iters}
    if edges is not None:
        result["edges_per_sec"] = edges / dt
    return result


class Counters:
    """Named scalar counters (monotonic adds) + gauges (last value)."""

    def __init__(self):
        self._counts = collections.defaultdict(float)
        self._gauges = {}

    def add(self, name: str, value: float = 1.0):
        self._counts[name] += float(value)

    def gauge(self, name: str, value: float):
        self._gauges[name] = float(value)

    def get(self, name: str) -> float:
        if name in self._counts:
            return self._counts[name]
        return self._gauges.get(name, 0.0)

    def summary(self) -> str:
        lines = [f"{k}: {v:g}" for k, v in sorted(self._counts.items())]
        lines += [f"{k}: {v:g} (gauge)" for k, v in sorted(self._gauges.items())]
        return "\n".join(lines)

    def reset(self):
        self._counts.clear()
        self._gauges.clear()


#: process-global counter registry used by solvers when enabled
counters = Counters()
