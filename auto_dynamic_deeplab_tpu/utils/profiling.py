"""Tracing / device-time measurement — TPU replacement for the reference's
cuda.synchronize + perf_counter brackets (ADD.py:380-437, autodeeplab.py:
206-229) and ptflops probes.

- ``trace(logdir)``: context manager around jax.profiler for XProf traces.
- ``device_time(fn, *args)``: median wall time of a jitted callable with
  block_until_ready fencing.
- ``flops_of(fn, *args)``: XLA cost-analysis FLOPs of the compiled program.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

from .flops import xla_cost


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call, device-fenced."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def flops_of(fn: Callable, *args) -> float:
    return float(xla_cost(fn, *args).get("flops", -1.0))
