"""Profiling helpers: compile-vs-run split timing around jit boundaries.

The reference only wall-clocks whole optimizer runs (Problem.py:833-836);
here we give first-class timers that force device completion so TPU timings
are honest.
"""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def Timer(label: str = "", results: dict | None = None):
    """Context manager measuring wall-clock seconds; stores into ``results``."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label or "elapsed"] = dt


def block_and_time(fn, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Run ``fn`` with device sync; return (result, compile_s, per_call_s).

    First call includes compilation; subsequent calls measure steady state.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(fn(*args, **kwargs))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / max(iters, 1)
    return out, compile_s, per_call
