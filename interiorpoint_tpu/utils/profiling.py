"""Profiling utilities: jax.profiler traces + wall-clock timing.

TPU-native replacement for the reference's cProfile wrapper
(reference: time_profiling.py:105-118): ``trace_solve`` captures an XLA
device trace viewable in TensorBoard/Perfetto, and ``time_solve`` reports
warm-cache wall-clock statistics the way the reference's benchmark loops
time ``solve()`` (reference: testSolver.py:150-159).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def device_trace(logdir="/tmp/ipx_trace"):
    """Capture a jax.profiler trace around a block of work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def trace_solve(solver, logdir="/tmp/ipx_trace", **solve_kwargs):
    """Profile one solve; returns (value, logdir)."""
    solver.solve(**solve_kwargs)  # warm the jit cache first
    with device_trace(logdir):
        value = solver.solve(**solve_kwargs)
    return value, logdir


def time_solve(solver, reps=3, warmup=1, **solve_kwargs):
    """Steady-state timing of solver.solve(); returns a stats dict."""
    for _ in range(warmup):
        solver.solve(**solve_kwargs)
    times = []
    for _ in range(reps):
        t0 = time.time()
        solver.solve(**solve_kwargs)
        times.append(time.time() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "min_s": float(np.min(times)),
        "max_s": float(np.max(times)),
        "times": times,
    }
