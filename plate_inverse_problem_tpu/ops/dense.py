"""Large dense inverses on TPU — Schur-recursive around the LU panel limit.

XLA:TPU lowers ``jnp.linalg.inv`` through a blocked LU whose (n, 128)
panel must fit in the 16 MB scoped VMEM: inversion fails outright above
n ~ 16k (measured: OOM in ``LuDecompositionBlock`` at n = 20916).  The
mixed engine's two-grid preconditioner wants exactly such an inverse (a
~20k-row coarse Galerkin operator), so this module provides a recursive
2x2 block (Schur-complement) inversion:

    inv([[A, B], [C, D]]) = [[iA + iA B iS C iA, -iA B iS],
                             [          -iS C iA,       iS]],
    S = D - C iA B

where the half-size diagonal inverses recurse until they fit the direct
path.  Everything outside the leaf inversions is plain GEMMs — MXU work
with no VMEM ceiling.  Numerically this is the block LDL^T inverse: for
the SPD operators it is used on (equilibrated Galerkin stiffness), the
Schur complement is again SPD and the recursion is stable.
"""
from __future__ import annotations

import jax.numpy as jnp

# measured safe direct-inversion ceiling on v5e (LU panel (n, 128) f32
# plus pivot state must fit the 16 MB scoped VMEM)
_DIRECT_MAX = 12288


def inv_refined(A, direct_max: int = _DIRECT_MAX, ns_iters: int = 3):
    """f32 inverse of an ill-conditioned SPD matrix, fit for use as a
    near-exact solve.

    A raw f32 LU inverse of a kappa ~ 1e9+ operator (an UNequilibrated
    Galerkin coarse stiffness, say) is garbage — eps32 * kappa >> 1.  Two
    standard fixes compose here:

    1. symmetric Jacobi equilibration (kappa of the scaled matrix drops to
       the operator's intrinsic spread, ~1e5-1e6 for the plate coarse
       levels), then
    2. Newton-Schulz polishing X <- X (2I - A X), which SQUARES the
       remaining eps32*kappa inverse error per step (two GEMMs each,
       one-time build cost).
    """
    d = jnp.diagonal(A)
    s = 1.0 / jnp.sqrt(jnp.where(jnp.abs(d) > 0, jnp.abs(d), 1.0))
    At = A * s[:, None] * s[None, :]
    X = inv_blocked(At, direct_max)
    eye = jnp.eye(A.shape[0], dtype=A.dtype)
    for _ in range(ns_iters):
        X = X @ (2.0 * eye - At @ X)
    return X * s[None, :] * s[:, None]


def inv_blocked(A, direct_max: int = _DIRECT_MAX):
    """Inverse of a (well-conditioned-after-equilibration) SPD matrix of
    any size on TPU; falls back to ``jnp.linalg.inv`` when it fits."""
    n = A.shape[0]
    if n <= direct_max:
        return jnp.linalg.inv(A)
    k = (n // 2 + 127) & ~127 or n // 2  # split at a lane-aligned row
    if k >= n:
        k = n // 2
    A11 = A[:k, :k]
    A12 = A[:k, k:]
    A21 = A[k:, :k]
    A22 = A[k:, k:]
    iA = inv_blocked(A11, direct_max)
    iA_B = iA @ A12
    S = A22 - A21 @ iA_B
    iS = inv_blocked(S, direct_max)
    C_iA = A21 @ iA
    top_right = -iA_B @ iS
    bottom_left = -iS @ C_iA
    top_left = iA - top_right @ C_iA
    return jnp.block([[top_left, top_right], [bottom_left, iS]])
