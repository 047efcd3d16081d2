"""Timing / throughput harness.

The reference has no profiling at all (SURVEY.md section 5); this provides
the hypotheses/s and LM-iterations/s measurements targeted by BASELINE.json,
plus easy access to ``jax.profiler`` traces.
"""

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that blocks on device completion."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def throughput(fn, *args, steps: int = 10, warmup: int = 1, items_per_step: int = 1):
    """items/s of ``fn(*args)``: compile via warmup, then steady-state rate."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    return items_per_step * steps / elapsed, elapsed


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """``jax.profiler`` trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
