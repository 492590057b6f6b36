"""Tracing / profiling subsystem.

The reference has no profiling beyond tqdm (SURVEY §5); here device-trace
capture and per-step wall-clock stats are first-class:

  * `trace(logdir)` — context manager around jax.profiler.trace; produces
    a TensorBoard-loadable trace of XLA ops on TPU.
  * `StepTimer` — EMA + percentile step timing with a jsonl sink, used by
    the trainer and extractor.
  * `device_time(fn, *args)` — wall-clock a jitted call with a value
    fetch (the axon relay dispatches asynchronously, so block_until_ready
    alone under-measures; fetching a scalar is the reliable sync).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into logdir (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics with optional jsonl persistence."""

    def __init__(self, sink_path: Optional[str] = None, window: int = 200):
        self.sink_path = sink_path
        self.window = window
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, **extra) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        if self.sink_path:
            with open(self.sink_path, "a") as f:
                f.write(json.dumps({"step_time_s": dt, **extra}) + "\n")
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.array(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "last_s": float(arr[-1]),
        }


def device_time(fn: Callable, *args, sync: Callable[[Any], float] = None,
                iters: int = 3) -> float:
    """Best-of-iters wall time of fn(*args), synced by fetching a scalar."""
    import jax.numpy as jnp

    if sync is None:
        def sync(out):
            leaf = next(iter(jax.tree.leaves(out)))
            return float(jnp.sum(leaf.astype(jnp.float32)[..., :1]))

    import jax

    out = fn(*args)
    sync(out)  # warmup / compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best
