"""Global precision / device policy for the TPU-native plate framework.

The reference pins JAX to CPU + float64 at import time
(/root/reference/source/jax_plate/Sparse.py:16-17).  We instead keep the
platform free (TPU first-class) and make precision a *policy*:

* ``x64``  — float64 / complex128 everywhere.  Default on CPU; exact parity
  with the reference's UMFPACK arithmetic.
* ``x32``  — float32 / complex64.  Native TPU speed; solves use iterative
  refinement in the solver layer to recover ~1e-6 relative accuracy.

The policy only selects *dtypes handed to the compute path*; modules query it
lazily, so it can be flipped per-process before building a Problem.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np

# Some TPU-plugin site hooks (axon) pin jax_platforms in-process, silently
# ignoring the user's JAX_PLATFORMS env var.  Honor an explicit non-plugin
# request (e.g. JAX_PLATFORMS=cpu for the virtual-device test path).
_env_platforms = os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and "axon" not in _env_platforms and "proxy" not in _env_platforms:
    try:
        if (jax.config.jax_platforms or "") != _env_platforms:
            jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

# float64 must be enabled process-wide for the x64 policy to mean anything.
# It is harmless under the x32 policy (arrays are created as f32 explicitly).
if os.environ.get("PIP_TPU_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 operand truncation, which caps linear-solver
# accuracy at ~1e-2 — useless for 1e-6-parity FEM solves.  Force true-f32
# matmul precision; the bf16 fast path can be re-enabled per-op where it is
# numerically safe (set PIP_TPU_MATMUL_PRECISION to override).
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("PIP_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent compilation cache: sweep-graph compiles are tens of seconds on
# TPU; cache them across processes (PIP_TPU_CACHE_DIR='' disables).
_cache_dir = os.environ.get("PIP_TPU_CACHE_DIR", "/tmp/pip_tpu_jax_cache")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@dataclass(frozen=True)
class Precision:
    """Dtype bundle used across assembly and solves."""

    real: np.dtype
    complex: np.dtype
    index: np.dtype

    @property
    def name(self) -> str:
        return "x64" if self.real == np.dtype(np.float64) else "x32"


X64 = Precision(np.dtype(np.float64), np.dtype(np.complex128), np.dtype(np.int32))
X32 = Precision(np.dtype(np.float32), np.dtype(np.complex64), np.dtype(np.int32))

_POLICY: Precision | None = None


def default_precision() -> Precision:
    """Resolve the active precision policy.

    Priority: explicit ``set_precision`` call > ``PIP_TPU_PRECISION`` env var >
    platform default (x64 on CPU, x32 on TPU/GPU).
    """
    global _POLICY
    if _POLICY is not None:
        return _POLICY
    env = os.environ.get("PIP_TPU_PRECISION")
    if env in ("x64", "f64", "float64"):
        return X64
    if env in ("x32", "f32", "float32"):
        return X32
    platform = jax.default_backend()
    return X64 if platform == "cpu" else X32


def set_precision(name: str) -> Precision:
    global _POLICY
    if name in ("x64", "f64", "float64"):
        _POLICY = X64
    elif name in ("x32", "f32", "float32"):
        _POLICY = X32
    elif name in (None, "auto"):
        _POLICY = None
    else:
        raise ValueError(f"Unknown precision policy {name!r}; use 'x64'/'x32'/'auto'.")
    return default_precision()
