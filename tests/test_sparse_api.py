"""Standalone sparse API: create_symbolic / matvec / spsolve with AD.

Covers the reference bridge contract (Sparse.py:92-116, 144-236): canonical
CSC entry order, transpose by index swap, implicit-diff gradients, and
vmap/hessian composition replacing the hand-written batch modes 0-4.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from plate_inverse_problem_tpu.ops import (
    create_symbolic, find_permutation, matvec, spsolve,
)


def _random_system(n, rng, dtype=np.float64, dups=False):
    """Well-conditioned sparse system with a guaranteed-dominant diagonal."""
    nnz = 4 * n
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    r = np.concatenate([r, np.arange(n)])
    c = np.concatenate([c, np.arange(n)])
    if np.issubdtype(dtype, np.complexfloating):
        v = rng.standard_normal(r.size) + 1j * rng.standard_normal(r.size)
    else:
        v = rng.standard_normal(r.size)
    v[-n:] = 10.0 + v[-n:]
    A = sp.coo_matrix((v.astype(dtype), (r, c)), shape=(n, n))
    if not dups:
        A = A.tocsc().tocoo()
    return A


def _canonical_data(A_coo, pat_rows, pat_cols, n):
    """Sum A's entries onto the canonical pattern order."""
    key_pat = pat_cols.astype(np.int64) * n + pat_rows.astype(np.int64)
    key_src = A_coo.col.astype(np.int64) * n + A_coo.row.astype(np.int64)
    pos = np.searchsorted(key_pat, key_src)
    data = np.zeros(len(pat_rows), dtype=A_coo.data.dtype)
    np.add.at(data, pos, A_coo.data)
    return data


def test_create_symbolic_csc_order_and_duplicates():
    rng = np.random.default_rng(0)
    n = 30
    A = _random_system(n, rng, dups=True)
    (rows, cols), pat = create_symbolic(
        n, np.stack([A.row, A.col], axis=1).astype(np.int32))
    # canonical order == scipy CSC entry order
    Ac = A.tocsc().tocoo()
    np.testing.assert_array_equal(rows, Ac.row)
    np.testing.assert_array_equal(cols, Ac.col)
    assert pat.nnz == Ac.nnz and pat.n == n
    # caller-side duplicate summing reproduces the matrix
    data = _canonical_data(A, rows, cols, n)
    np.testing.assert_allclose(data, Ac.data, rtol=1e-15)


def test_find_permutation_roundtrip():
    rng = np.random.default_rng(1)
    n = 50
    idx = np.unique(rng.integers(0, 40, (n, 2)), axis=0)
    perm = rng.permutation(idx.shape[0])
    p = find_permutation(idx, idx[perm])
    np.testing.assert_array_equal(idx[p], idx[perm])


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_matvec_forward_and_transpose(dtype):
    rng = np.random.default_rng(2)
    n = 40
    A = _random_system(n, rng, dtype)
    (rows, cols), pat = create_symbolic(
        n, np.stack([A.row, A.col], axis=1).astype(np.int32), dtype)
    data = _canonical_data(A, rows, cols, n)
    x = rng.standard_normal(n).astype(dtype)
    y = matvec(pat, jnp.asarray(data), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12)
    yt = matvec(pat, jnp.asarray(data), jnp.asarray(x), transpose=True)
    np.testing.assert_allclose(np.asarray(yt), A.T @ x, rtol=1e-12)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_spsolve_matches_splu(dtype):
    rng = np.random.default_rng(3)
    n = 60
    A = _random_system(n, rng, dtype)
    (rows, cols), pat = create_symbolic(
        n, np.stack([A.row, A.col], axis=1).astype(np.int32), dtype)
    data = _canonical_data(A, rows, cols, n)
    b = rng.standard_normal(n).astype(dtype)
    x = spsolve(pat, jnp.asarray(data), jnp.asarray(b))
    x_ref = spla.splu(A.tocsc()).solve(b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-12)
    xt = spsolve(pat, jnp.asarray(data), jnp.asarray(b), transpose=True)
    xt_ref = spla.splu(A.T.tocsc()).solve(b)
    np.testing.assert_allclose(np.asarray(xt), xt_ref, rtol=1e-9, atol=1e-12)


def test_spsolve_gradient_vs_fd():
    rng = np.random.default_rng(4)
    n = 25
    A = _random_system(n, rng)
    (rows, cols), pat = create_symbolic(
        n, np.stack([A.row, A.col], axis=1).astype(np.int32))
    data = _canonical_data(A, rows, cols, n)
    b = rng.standard_normal(n)
    w = rng.standard_normal(n)

    def loss(d):
        return jnp.dot(jnp.asarray(w), spsolve(pat, d, jnp.asarray(b)))

    g = jax.grad(loss)(jnp.asarray(data))
    eps = 1e-6
    for k in [0, 7, len(data) // 2, len(data) - 1]:
        dp = data.copy(); dp[k] += eps
        dm = data.copy(); dm[k] -= eps
        fd = (loss(jnp.asarray(dp)) - loss(jnp.asarray(dm))) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=2e-5)


def test_spsolve_vmap_and_hessian_compose():
    """The reference needed batch modes 0-4 (Sparse.py:238-282); here vmap
    and jax.hessian compose natively through custom_linear_solve."""
    rng = np.random.default_rng(5)
    n = 15
    A = _random_system(n, rng)
    (rows, cols), pat = create_symbolic(
        n, np.stack([A.row, A.col], axis=1).astype(np.int32))
    data = _canonical_data(A, rows, cols, n)
    B = rng.standard_normal((4, n))

    # mode 2: rhs batched
    X = jax.vmap(lambda bb: spsolve(pat, jnp.asarray(data), bb))(
        jnp.asarray(B))
    lu = spla.splu(A.tocsc())
    for i in range(4):
        np.testing.assert_allclose(np.asarray(X[i]), lu.solve(B[i]),
                                   rtol=1e-9, atol=1e-12)

    # mode 4: hessian (two batch dims over the matrix data)
    th0 = jnp.asarray([1.0, 2.0])
    d0 = jnp.asarray(data)
    b0 = jnp.asarray(B[0])
    w = jnp.asarray(rng.standard_normal(n))

    def f(th):
        d = th[0] * d0 + th[1] * d0 ** 2 / 10.0
        return jnp.dot(w, spsolve(pat, d, b0)) ** 2

    H = jax.hessian(f)(th0)
    assert H.shape == (2, 2) and bool(jnp.all(jnp.isfinite(H)))
    # symmetry is a nontrivial correctness signal for the transpose rule
    np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, rtol=1e-7)
    # spot-check H[0,0] by finite differences of the gradient
    g = jax.grad(f)
    eps = 1e-5
    fd = (g(th0 + jnp.asarray([eps, 0.0]))[0]
          - g(th0 - jnp.asarray([eps, 0.0]))[0]) / (2 * eps)
    np.testing.assert_allclose(float(H[0, 0]), float(fd), rtol=1e-4)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_spsolve_demoted_refinement_recovers_64bit(dtype):
    """The TPU numeric recipe (32-bit LU + split-f64 refinement) exercised
    on CPU by forcing the demotion: start from an f32/c64 factorization and
    check the refinement loop recovers ~1e-12-grade solutions on a
    moderately conditioned system."""
    rng = np.random.default_rng(7)
    n = 60
    A = np.asarray(rng.standard_normal((n, n)))
    if dtype == np.complex128:
        A = A + 1j * rng.standard_normal((n, n))
    A = A + n * np.eye(n)  # diagonally dominant: kappa modest
    # dense pattern
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    idx = np.stack([rr.ravel(), cc.ravel()], axis=1).astype(np.int32)
    (rows, cols), pat = create_symbolic(n, idx, dtype)
    data = A[rows, cols].astype(dtype)
    b = rng.standard_normal(n).astype(dtype)

    x_ref = np.linalg.solve(A, b)

    # baseline: what a pure 32-bit solve leaves on the table
    x32 = np.linalg.solve(
        A.astype(np.complex64 if dtype == np.complex128 else np.float32),
        b.astype(np.complex64 if dtype == np.complex128 else np.float32))
    err32 = np.linalg.norm(x32 - x_ref) / np.linalg.norm(x_ref)
    assert err32 > 1e-8  # the 32-bit error is actually visible

    # monkeypatch the backend check so the demotion branch runs on CPU
    import plate_inverse_problem_tpu.ops.sparse_api as mod
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        x = np.asarray(mod.spsolve(pat, jnp.asarray(data), jnp.asarray(b)))
    finally:
        jax.default_backend = orig
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-12, f"refined solve error {err:.2e}"
