"""Generalized symmetric eigendecomposition K z = lam M z on device.

This is the 'symbolic factorization' of the modal solver engine: computed once
per parameter set (outside the frequency loop), it diagonalizes every
``A(omega) = (1+i*beta) K - omega^2 M`` in the sweep simultaneously — the
TPU-shaped replacement for UMFPACK's per-frequency numeric factorization
(reference InnerState.h:240-305).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def generalized_eigh(K, M):
    """Solve K Z = M Z diag(lam) with Z^T M Z = I (K sym, M SPD).

    Standard Cholesky reduction: M = L L^T, C = L^-1 K L^-T, eigh(C) -> (lam,
    Q), Z = L^-T Q.  All dense linear algebra — maps onto the MXU.
    """
    L = jnp.linalg.cholesky(M)
    Y = solve_triangular(L, K, lower=True)
    C = solve_triangular(L, Y.T, lower=True).T
    C = 0.5 * (C + C.T)  # kill roundoff asymmetry before eigh
    lam, Q = jnp.linalg.eigh(C)
    Z = solve_triangular(L.T, Q, lower=False)
    return lam, Z


def modal_basis_from_flat(K_flat_real, M_flat, rows, cols, n: int,
                          method: str = "auto"):
    """Eigenbasis of the *real part* of the flat stiffness against the mass.

    Gradients are stopped — the basis is numerical data used to apply exact
    ``A^{-1}``; parameter sensitivities flow through the implicit-diff rule of
    the sweep, never through eigh (which is unstable under eigenvalue
    crossings as the optimizer moves theta).

    ``method``: 'lapack' (XLA/LAPACK eigh), 'jacobi' (the block-Jacobi
    solver in ``ops.jacobi_eigh`` — O(1)-in-N compile time, MXU-bound), or
    'auto' (lapack on CPU, jacobi on accelerators where XLA eigh compile
    time explodes with N).
    """
    from .scatter import to_dense

    Kr = to_dense(jax.lax.stop_gradient(K_flat_real), rows, cols, n)
    Md = to_dense(jax.lax.stop_gradient(M_flat), rows, cols, n)
    Kr = 0.5 * (Kr + Kr.T)
    Md = 0.5 * (Md + Md.T)

    if method == "auto":
        method = "lapack" if jax.default_backend() == "cpu" else "jacobi"
    if method == "jacobi":
        from .jacobi_eigh import generalized_jacobi_eigh

        return generalized_jacobi_eigh(Kr, Md)
    return generalized_eigh(Kr, Md)
