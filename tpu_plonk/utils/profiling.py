"""Profiling hooks (SURVEY.md §5.1): wrap any prover region in a JAX
profiler trace for TensorBoard/XProf inspection, plus a simple
wall-clock roofline report helper used by bench.py."""

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = None):
    """Capture a device trace: `with profiling.trace('/tmp/trace'): ...`."""
    log_dir = log_dir or os.path.join(os.getcwd(), ".cache", "profile")
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    # traces are viewable with tensorboard --logdir <log_dir>


@contextlib.contextmanager
def timed(label: str, sink: dict = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[label] = dt
