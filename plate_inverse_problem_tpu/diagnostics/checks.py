"""Numerical-health guards.

The reference's failure handling is status-check-and-raise (UMFPACK status ->
runtime_error, umfpack_interface.h:10-18; argument validation everywhere).
Here the runtime is XLA, so guards are functional: NaN/Inf checking wrappers
built on jax.debug/checkify that can wrap any loss or FR function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def assert_finite(name: str = "value"):
    """Returns fn(x) -> x that raises (via checkify) on NaN/Inf under jit."""
    from jax.experimental import checkify

    def guard(x):
        checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains NaN/Inf")
        return x

    return guard


def checked(fn):
    """Wrap a jittable function so it returns (err, out); err.throw() raises
    with location info if any checkify assertion fired."""
    from jax.experimental import checkify

    return checkify.checkify(fn)


def nan_guard(fn, label: str = "output"):
    """Eager wrapper: evaluates fn and raises FloatingPointError on non-finite
    results (the simple production guard for optimizer loops)."""

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        leaves = jax.tree.leaves(out)
        for leaf in leaves:
            if hasattr(leaf, "dtype") and not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(f"{label}: non-finite values detected")
        return out

    return wrapped
