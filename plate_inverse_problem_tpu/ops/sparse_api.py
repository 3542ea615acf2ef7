"""Standalone sparse linear-algebra API over a static sparsity pattern.

The reference exposes its solver bridge as three primitives that work on ANY
square CSC system, independent of the plate pipeline: ``create_symbolic`` /
``spsolve`` / ``matvec`` (reference Sparse.py:92-116, 144-236, backed by the
UMFPACK ``InnerState`` C++ registry, InnerState.h:120-308).  This module is
the TPU-native counterpart:

* ``create_symbolic(N, indices, dtype)`` canonicalizes the pattern on the
  host exactly like the reference (CSC entry order, duplicates summed) and
  returns the canonical ``(row, col)`` plus a hashable :class:`SymbolicPattern`
  that plays the role of the reference's ``solver_num`` registry handle —
  except nothing is process-global: the pattern is plain data, safe across
  jit boundaries and processes.
* ``matvec(pattern, data, vec)`` is one gather + segment-scatter over the
  static pattern (exact in f64 elementwise on TPU); the transpose is an
  index swap — no stored permutation needed (the reference precomputes one,
  Sparse.py:104-114).
* ``spsolve(pattern, data, b)`` solves ``A x = b`` with implicit-diff AD
  via ``lax.custom_linear_solve``: gradients come from one transposed solve
  plus a pattern-restricted outer product — the same adjoint rules as the
  reference's JVP/transpose registrations (Sparse.py:200-222) — and compose
  with ``jax.vmap`` / ``jax.hessian`` without hand-written batching rules
  (the reference needed explicit batch modes 0-4, Sparse.py:238-282).

There is no f64/complex128 factorization on TPU hardware, so the numeric
path mirrors the plate engines: factor dense in the 32-bit twin dtype on
the MXU, then recover 64-bit-grade solutions with iterative refinement whose
residual is evaluated by the exact split-f64 flat-pattern SpMV.  On CPU the
factorization is natively 64-bit and refinement is skipped.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .scatter import spmv_flat, to_dense

__all__ = ["SymbolicPattern", "create_symbolic", "find_permutation",
           "matvec", "spsolve", "FAMILIES"]

# dtype families accepted by the reference bridge (Sparse.py:87-90); index
# width is immaterial here (patterns are host numpy), kept for parity checks
FAMILIES = {
    (np.dtype(np.float64), np.dtype(np.int32)): "di",
    (np.dtype(np.float64), np.dtype(np.int64)): "dl",
    (np.dtype(np.complex128), np.dtype(np.int32)): "zi",
    (np.dtype(np.complex128), np.dtype(np.int64)): "zl",
}


def find_permutation(arr1: np.ndarray, arr2: np.ndarray,
                     max_val: int | None = None) -> np.ndarray:
    """Permutation ``p`` with ``arr1[p] == arr2`` for (N, 2) index arrays.

    Provided for reference-API parity (Sparse.py:46-85); the TPU pipeline
    itself never needs a stored transpose permutation.  Unlike the
    reference's ``is2[is2[is2]]`` trick (valid only for sorted-unique
    patterns), this inverts the argsort explicitly, so it is correct for
    any duplicate-free pair of patterns.
    """
    arr1 = np.asarray(arr1)
    arr2 = np.asarray(arr2)
    if arr1.shape != arr2.shape or arr1.ndim != 2 or arr1.shape[1] != 2:
        raise ValueError("expected two (N, 2) integer arrays of equal shape")
    if max_val is None:
        max_val = int(max(arr1.max(initial=0), arr2.max(initial=0))) + 1
    u1 = arr1[:, 0].astype(np.int64) + arr1[:, 1].astype(np.int64) * max_val
    u2 = arr2[:, 0].astype(np.int64) + arr2[:, 1].astype(np.int64) * max_val
    is1 = np.argsort(u1)
    is2 = np.argsort(u2)
    inv2 = np.empty_like(is2)
    inv2[is2] = np.arange(is2.size)
    return is1[inv2].astype(arr1.dtype)


class SymbolicPattern:
    """Static sparsity pattern of a square matrix — the 'symbolic' half of
    the reference's symbolic/numeric split (InnerState.add_mat performs the
    UMFPACK symbolic factorization once per pattern, InnerState.h:120-162).

    On TPU the symbolic stage is trace-time data: the canonical entry order
    plus the size.  Stores the indices as int32 numpy arrays (a tuple of
    boxed Python ints would cost ~30x the memory and an O(nnz) conversion
    on every matvec/spsolve at FEM sizes); hashable — via a lazily computed
    content digest — so it can still ride as a static jit argument.
    """

    __slots__ = ("n", "_rows", "_cols", "_hash")

    def __init__(self, n: int, rows, cols):
        self.n = int(n)
        self._rows = np.ascontiguousarray(rows, dtype=np.int32)
        self._cols = np.ascontiguousarray(cols, dtype=np.int32)
        self._rows.setflags(write=False)
        self._cols.setflags(write=False)
        self._hash = None

    @property
    def nnz(self) -> int:
        return int(self._rows.size)

    def rows_array(self) -> np.ndarray:
        return self._rows

    def cols_array(self) -> np.ndarray:
        return self._cols

    def __hash__(self):
        if self._hash is None:
            self._hash = hash(
                (self.n, self._rows.tobytes(), self._cols.tobytes()))
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, SymbolicPattern) and self.n == other.n
                and np.array_equal(self._rows, other._rows)
                and np.array_equal(self._cols, other._cols))

    def __repr__(self):
        return f"SymbolicPattern(n={self.n}, nnz={self.nnz})"


def create_symbolic(N: int, indices: np.ndarray,
                    mat_dtype=np.float64) -> tuple[tuple, SymbolicPattern]:
    """Canonicalize a COO pattern: returns ``((row, col), pattern)``.

    Matches the reference contract (Sparse.py:92-116): the returned
    ``(row, col)`` is the CSC entry order (sorted by column, then row) with
    duplicates merged, and ``data`` arrays passed to :func:`matvec` /
    :func:`spsolve` must live in that order (duplicate source entries
    summed by the caller, e.g. via ``np.add.at`` over the inverse map).
    """
    indices = np.asarray(indices)
    if indices.ndim != 2 or indices.shape[1] != 2:
        raise ValueError("indices must be (nnz, 2) [row, col] pairs")
    fam = (np.dtype(mat_dtype), indices.dtype)
    if fam not in FAMILIES and np.dtype(mat_dtype) not in (
            np.dtype(np.float32), np.dtype(np.complex64)):
        raise TypeError(
            f"unsupported dtype family {fam}; expected one of "
            f"{list(FAMILIES)} or the 32-bit twins")
    r = indices[:, 0].astype(np.int64)
    c = indices[:, 1].astype(np.int64)
    if r.size and (r.min() < 0 or r.max() >= N or c.min() < 0 or c.max() >= N):
        raise ValueError("indices out of range for an NxN matrix")
    key = c * N + r                       # CSC order: by column, then row
    uniq = np.unique(key)
    rows = (uniq % N).astype(np.int32)
    cols = (uniq // N).astype(np.int32)
    pat = SymbolicPattern(int(N), rows, cols)
    return (rows, cols), pat


def matvec(pattern: SymbolicPattern, data, vec, transpose: bool = False,
           indices=None):
    """``A @ vec`` (or ``A.T @ vec``) over the static pattern.

    Differentiable in both ``data`` and ``vec`` through JAX's native
    gather/scatter rules — the cotangent w.r.t. ``data`` is the
    pattern-restricted outer product ``ct[row] * vec[col]``, exactly the
    reference's hand-written transpose rule (Sparse.py:168-176).  Batch by
    ``jax.vmap``; complex data may arrive as complex64/128 (elementwise
    complex scatter is exact on TPU).

    ``indices``: optional traced ``(rows, cols)`` pair overriding the
    pattern's host arrays.  Under jit the host arrays lower to HLO
    constants, which the axon TPU AOT compiler handles poorly for LARGE
    constant index sets — pass the indices as jit arguments there (the
    plate pipeline always does).
    """
    if indices is not None:
        rows, cols = (jnp.asarray(i) for i in indices)
    else:
        rows = jnp.asarray(pattern.rows_array())
        cols = jnp.asarray(pattern.cols_array())
    dt = jnp.promote_types(jnp.asarray(data).dtype, jnp.asarray(vec).dtype)
    return spmv_flat(jnp.asarray(data).astype(dt), rows, cols,
                     jnp.asarray(vec).astype(dt), pattern.n,
                     transpose=transpose)


def _twin32(dt):
    if dt == jnp.complex128:
        return jnp.complex64
    if dt == jnp.float64:
        return jnp.float32
    return dt


def spsolve(pattern: SymbolicPattern, data, b, transpose: bool = False,
            refine_steps: int | None = None, indices=None):
    """Solve ``A x = b`` (or ``A^T x = b``) on the static pattern, with AD.

    Numeric recipe (per call — the symbolic stage lives in ``pattern``):
    densify onto (n, n), LU-factor in the widest dtype the backend supports
    natively (32-bit twins on TPU), then ``refine_steps`` rounds of
    iterative refinement against the exact 64-bit flat-pattern SpMV.
    Default refinement: 3 rounds when the factorization had to be demoted,
    0 otherwise.  Each round contracts the error by ~eps32 * kappa(A); for
    kappa beyond ~1e7 raise ``refine_steps``.

    AD: ``lax.custom_linear_solve`` — reverse mode performs one transposed
    solve (same factorization recipe), tangents/cotangents w.r.t. ``data``
    flow through the pattern-restricted matvec.  Composes with vmap/jacobian/
    hessian (the reference's batch modes 0-4, Sparse.py:238-282, are
    subsumed by vmap's native batching of the custom_linear_solve).

    Accelerator complex caveat: demoted complex solves factor the
    split-real 2n x 2n embedding in f32 (no complex LU is attempted on
    device), but the complex ``data``/``b`` arrays themselves must be
    representable on the backend — true for CPU and for backends that
    admit complex128 storage.  If the platform rejects complex128
    tensors outright, pass the split-real embedding yourself or use the
    plate engines (ops/mixed.py), which are split-complex end to end.

    ``indices``: optional traced ``(rows, cols)`` override — see
    :func:`matvec` for when to use it.
    """
    if indices is not None:
        rows, cols = (jnp.asarray(i) for i in indices)
    else:
        rows = jnp.asarray(pattern.rows_array())
        cols = jnp.asarray(pattern.cols_array())
    n = pattern.n
    data = jnp.asarray(data)
    b = jnp.asarray(b)
    dt = jnp.promote_types(data.dtype, b.dtype)
    wide = dt in (jnp.float64, jnp.complex128)
    # Only the CPU backend has a 64-bit LU; every accelerator (tpu/axon/...)
    # takes the demoted-factorization + refinement path
    demote = wide and jax.default_backend() != "cpu"
    if refine_steps is None:
        refine_steps = 3 if demote else 0
    is_cpx = jnp.issubdtype(dt, jnp.complexfloating)
    # Demoted complex solves factor the split-real 2n x 2n embedding
    # [[Ar, -Ai], [Ai, Ar]] in f32: complex128 is not a TPU type at all,
    # and the split form keeps the whole numeric path on plain-f32 MXU LU.
    split_cpx = is_cpx and demote
    fdt = (jnp.float32 if split_cpx else _twin32(dt)) if demote else dt

    if transpose:
        rows, cols = cols, rows

    def solver(tr: bool):
        rr, cc = (cols, rows) if tr else (rows, cols)

        def _factor(dre, dim):
            if split_cpx:
                Ar = to_dense(dre, rr, cc, n).astype(fdt)
                Ai = to_dense(dim, rr, cc, n).astype(fdt)
                Abig = jnp.block([[Ar, -Ai], [Ai, Ar]])
                return jax.scipy.linalg.lu_factor(Abig)
            A = to_dense(data.astype(dt), rr, cc, n)
            return jax.scipy.linalg.lu_factor(A.astype(fdt))

        def _apply_inv(fac, v_re, v_im):
            if split_cpx:
                vbig = jnp.concatenate([v_re, v_im]).astype(fdt)
                ubig = jax.scipy.linalg.lu_solve(fac, vbig)
                return (ubig[:n].astype(jnp.float64),
                        ubig[n:].astype(jnp.float64))
            if is_cpx:
                u = jax.scipy.linalg.lu_solve(
                    fac, (v_re + 1j * v_im).astype(fdt))
                return (jnp.real(u).astype(jnp.float64),
                        jnp.imag(u).astype(jnp.float64))
            u = jax.scipy.linalg.lu_solve(fac, v_re.astype(fdt))
            return u.astype(jnp.float64), None

        def slv(_, bb):
            d64 = jax.lax.stop_gradient(data)
            dre = jnp.real(d64).astype(jnp.float64)
            dim = jnp.imag(d64).astype(jnp.float64) if is_cpx else None
            b_re = jnp.real(bb).astype(jnp.float64)
            b_im = (jnp.imag(bb).astype(jnp.float64) if is_cpx
                    else jnp.zeros_like(b_re))
            fac = _factor(dre, dim)
            u_re, u_im = _apply_inv(fac, b_re, b_im)
            # refinement: exact 64-bit residual through the flat SpMV
            # (split re/im pairs — complex128 is not a TPU type)
            for _ in range(refine_steps):
                Ar_u = spmv_flat(dre, rr, cc, u_re, n)
                if is_cpx:
                    r_re = b_re - (Ar_u - spmv_flat(dim, rr, cc, u_im, n))
                    r_im = b_im - (spmv_flat(dim, rr, cc, u_re, n)
                                   + spmv_flat(dre, rr, cc, u_im, n))
                else:
                    r_re = b_re - Ar_u
                    r_im = b_im
                c_re, c_im = _apply_inv(fac, r_re, r_im)
                u_re = u_re + c_re
                if is_cpx:
                    u_im = u_im + c_im
            out = (u_re + 1j * u_im) if is_cpx else u_re
            return out.astype(dt)

        return slv

    def mv(x):
        return spmv_flat(data.astype(dt), rows, cols, x, n)

    return jax.lax.custom_linear_solve(
        mv, b.astype(dt), solve=solver(False), transpose_solve=solver(True))
