"""Profiler capture helpers (SURVEY §5 tracing row).

The reference ships wall-clock prints around its solver loops
(/root/reference/examples/cpu_benchmark.py:20-36); the TPU-native
equivalent is an XLA trace: per-op device timelines viewable in
TensorBoard/Perfetto.  These wrappers standardize where captures land and
pair them with the wall-clock timers in utils/timers.py.
"""
from __future__ import annotations

import contextlib
import os
import time


def default_trace_dir() -> str:
    return os.environ.get("PIP_TPU_TRACE_DIR", "/tmp/pip_tpu_traces")


@contextlib.contextmanager
def trace(label: str = "trace", logdir: str | None = None):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    Produces a timestamped run directory under ``logdir`` (default
    ``$PIP_TPU_TRACE_DIR`` or /tmp/pip_tpu_traces) — point TensorBoard or
    xprof at it.  Yields the run directory path.
    """
    import jax

    root = logdir or default_trace_dir()
    run = os.path.join(root, f"{label}-{time.strftime('%Y%m%d-%H%M%S')}")
    os.makedirs(run, exist_ok=True)
    with jax.profiler.trace(run):
        yield run


def profile_call(fn, *args, label: str = "call", logdir: str | None = None,
                 warmup: bool = True):
    """Run ``fn(*args)`` under a profiler trace (after an optional warmup
    call so compilation does not dominate the timeline).

    Returns ``(result, run_dir, wall_seconds)``.
    """
    import jax

    if warmup:
        jax.block_until_ready(fn(*args))
    with trace(label, logdir) as run:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
    return out, run, dt
