"""Profiling helpers (SURVEY.md §5: the reference has none; we provide
jax.profiler traces plus a simple throughput harness)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(
    fn: Callable,
    *args,
    items_per_call: int,
    iters: int = 20,
    warmup: int = 2,
    force_fetch: bool = True,
) -> dict:
    """Steady-state items/sec of a jitted callable.

    `force_fetch=True` pulls a (small) result each iteration — on remote backends
    block_until_ready may not await execution (see bench.py); prefer returning a
    scalar/small array from `fn`.
    """
    for _ in range(warmup):
        out = fn(*args)
        if force_fetch:
            jax.tree_util.tree_map(np.asarray, out)
        else:
            jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if force_fetch:
            jax.tree_util.tree_map(np.asarray, out)
    if not force_fetch:
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "items_per_sec": items_per_call * iters / dt,
        "ms_per_call": dt / iters * 1000,
        "iters": iters,
    }
