"""Jit'd elementwise smoke test + device inventory report."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _kernel(x):
    return 2.0 * x + jnp.sin(x)


def test_function(x: np.ndarray, verbose: bool = False) -> np.ndarray:
    """Compute ``2x + sin(x)`` on device; the analog of the reference's
    OpenMP smoke kernel (test_function.h:18-46).  Returns a numpy array."""
    t0 = time.perf_counter()
    y = _kernel(jnp.asarray(x))
    y.block_until_ready()
    if verbose:
        n_dev = len(jax.devices())
        print(f"devices: {n_dev} ({jax.default_backend()}), "
              f"elapsed: {time.perf_counter() - t0:.4f}s, n={np.size(x)}")
    return np.asarray(y)


def device_report() -> dict:
    """Inventory of visible devices (replaces the thread-count report)."""
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "n_devices": len(devs),
        "devices": [str(d) for d in devs],
        "x64": jax.config.jax_enable_x64,
    }
