"""Flat-pattern sparse <-> dense ops.

The framework stores every FEM matrix as flat nonzero data over one static
(row, col) pattern (the same flattening as reference Problem.py:241-253).
These helpers densify for factorization and apply sparse mat-vecs for the AD
rules — the on-device counterpart of the reference's ``csc_matvec`` C++ kernel
(/root/reference/source/jax_plate_lib/include/csc_matvec.h:31-66).  The
transpose comes free by swapping the gather indices; no permutation trick
(Sparse.py:46-85) is needed.
"""
from __future__ import annotations

import jax.numpy as jnp


def to_dense(data, rows, cols, n: int):
    """Scatter flat COO data into a dense (n, n) matrix (duplicates add)."""
    out = jnp.zeros((n, n), dtype=data.dtype)
    return out.at[rows, cols].add(data)


def spmv_flat(data, rows, cols, x, n: int, transpose: bool = False):
    """y = A @ x with A given as flat COO data; x may be batched (..., n).

    ``transpose=True`` computes A^T @ x by swapping the index roles — the
    analog of the reference's transposed CSC matvec (csc_matvec.h:49-66).
    """
    r, c = (cols, rows) if transpose else (rows, cols)
    contrib = data * x[..., c]
    out = jnp.zeros(x.shape[:-1] + (n,), dtype=contrib.dtype)
    return out.at[..., r].add(contrib)
