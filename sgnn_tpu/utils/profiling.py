"""Observability: step timing + XLA profiler traces.

The reference logs wall-clock per 20 iters into CSV (/root/reference/torch/
train.py:302-304) and has no profiler. Here tracing is first-class:

    with trace("/tmp/trace"):      # open in xprof/tensorboard
        train_step(...)

    timer = StepTimer()
    with timer.step():
        ...
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._n = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        a = np.asarray(self.times)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "median_s": float(np.median(a)),
            "p90_s": float(np.percentile(a, 90)),
            "steps_per_sec": float(1.0 / np.median(a)),
        }


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            pass
    return out
