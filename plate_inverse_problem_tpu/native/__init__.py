"""Native host-runtime library (C, loaded via ctypes).

The reference keeps its init-time/runtime plumbing in C++
(/root/reference/source/jax_plate_lib: pattern registry, CSC matvec, OpenMP
batch loop).  Here the device owns the compute path, and this library owns
the host runtime hot spots:

* grid-accelerated point-in-triangle location (interpolation operators),
* flat-pattern scatter-add accumulation (assembly),
* the elementwise smoke kernel (diagnostics parity with test_function.h).

Build: ``cc -O3 -shared -fPIC`` at first import (cached as ``.so`` next to
the source); every entry point has a numpy fallback, so the framework works
without a C toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "pipnative.c")
_SO = os.path.join(_HERE, "_pipnative.so")

_lib = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c99", _SRC, "-o", _SO, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.pip_smoke.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.pip_coo_accumulate.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.pip_locate_points.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def _ptr(arr, ct):
    return arr.ctypes.data_as(ctypes.POINTER(ct))


def available() -> bool:
    return get_lib() is not None


def smoke(x: np.ndarray) -> np.ndarray:
    """2x + sin(x) through the native kernel (numpy fallback)."""
    lib = get_lib()
    x = np.ascontiguousarray(x, dtype=np.float64)
    if lib is None:
        return 2.0 * x + np.sin(x)
    y = np.empty_like(x)
    lib.pip_smoke(_ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double), x.size)
    return y


def coo_accumulate(slots: np.ndarray, vals: np.ndarray, size: int) -> np.ndarray:
    """out[slots] += vals with duplicate accumulation (np.add.at fallback)."""
    lib = get_lib()
    out = np.zeros(size, dtype=np.float64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    slots = np.ascontiguousarray(slots, dtype=np.int64)
    if lib is None:
        np.add.at(out, slots, vals)
        return out
    lib.pip_coo_accumulate(
        _ptr(slots, ctypes.c_int64), _ptr(vals, ctypes.c_double),
        _ptr(out, ctypes.c_double), slots.size,
    )
    return out


def locate_points(nodes: np.ndarray, triangles: np.ndarray, points: np.ndarray):
    """Grid-accelerated (tri_index, barycentric) lookup; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes, dtype=np.float64)
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    pts = np.ascontiguousarray(np.atleast_2d(points), dtype=np.float64)
    out_tri = np.empty(pts.shape[0], dtype=np.int32)
    out_bary = np.empty((pts.shape[0], 3), dtype=np.float64)
    lib.pip_locate_points(
        _ptr(nodes, ctypes.c_double), nodes.shape[0],
        _ptr(tris, ctypes.c_int32), tris.shape[0],
        _ptr(pts, ctypes.c_double), pts.shape[0],
        _ptr(out_tri, ctypes.c_int32), _ptr(out_bary, ctypes.c_double),
    )
    return out_tri, out_bary
