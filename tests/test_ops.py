"""Sweep solver engines: correctness vs dense reference, AD vs finite diff.

The AD contract mirrors the reference's implicit-diff primitive rules
(Sparse.py:200-222): gradients come from adjoint solves, never unrolling.
"""
import numpy as np
import jax
import jax.numpy as jnp

from plate_inverse_problem_tpu.ops.scatter import to_dense, spmv_flat
from plate_inverse_problem_tpu.ops.spectral import generalized_eigh
from plate_inverse_problem_tpu.ops.sweep import modal_sweep, direct_sweep, sweep_solve


def _random_system(n=24, nnz_frac=0.35, seed=0):
    """Random symmetric stiffness pattern + SPD mass over the same pattern."""
    rng = np.random.default_rng(seed)
    # build a symmetric pattern containing the diagonal
    mask = rng.random((n, n)) < nnz_frac
    mask = mask | mask.T | np.eye(n, dtype=bool)
    rows, cols = np.nonzero(mask)

    Kd = rng.standard_normal((n, n))
    Kd = (Kd + Kd.T) * mask
    Kd = Kd + np.diag(np.abs(Kd).sum(1) + 1.0)  # diagonally dominant SPD-ish
    Md = rng.standard_normal((n, n)) * 0.05
    Md = (Md + Md.T) * mask
    Md = Md + np.diag(np.abs(Md).sum(1) + 1.0)

    K_flat = Kd[rows, cols]
    M_flat = Md[rows, cols]
    return n, rows, cols, K_flat, M_flat, Kd, Md


def test_scatter_roundtrip():
    n, rows, cols, K_flat, _, Kd, _ = _random_system()
    D = np.asarray(to_dense(jnp.asarray(K_flat), rows, cols, n))
    np.testing.assert_allclose(D, Kd, atol=1e-14)


def test_spmv_matches_dense():
    n, rows, cols, K_flat, _, Kd, _ = _random_system()
    x = np.random.default_rng(1).standard_normal((5, n))
    y = np.asarray(spmv_flat(jnp.asarray(K_flat), rows, cols, jnp.asarray(x), n))
    np.testing.assert_allclose(y, x @ Kd.T, rtol=1e-12)
    yt = np.asarray(
        spmv_flat(jnp.asarray(K_flat), rows, cols, jnp.asarray(x), n, transpose=True)
    )
    np.testing.assert_allclose(yt, x @ Kd, rtol=1e-12)


def test_generalized_eigh():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system()
    lam, Z = generalized_eigh(jnp.asarray(Kd), jnp.asarray(Md))
    lam, Z = np.asarray(lam), np.asarray(Z)
    np.testing.assert_allclose(Kd @ Z, Md @ Z * lam[None, :], atol=1e-9)
    np.testing.assert_allclose(Z.T @ Md @ Z, np.eye(n), atol=1e-10)


def _solve_reference(Kd, Md, beta, omegas, B):
    """Dense numpy oracle: A(om) = (1+i beta) K - om^2 M."""
    out = []
    for om, b in zip(omegas, B):
        A = (1 + 1j * beta) * Kd - om**2 * Md
        out.append(np.linalg.solve(A, b))
    return np.array(out)


def test_modal_matches_dense_oracle():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system()
    beta = 0.01
    omegas = np.linspace(0.5, 3.0, 7)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((7, n)) + 1j * rng.standard_normal((7, n))

    Kc = (1 + 1j * beta) * K_flat
    U = np.asarray(
        modal_sweep(jnp.asarray(Kc), jnp.asarray(M_flat), jnp.asarray(B),
                    jnp.asarray(omegas), rows, cols, n)
    )
    U_ref = _solve_reference(Kd, Md, beta, omegas, B)
    np.testing.assert_allclose(U, U_ref, rtol=1e-8, atol=1e-10)


def test_direct_matches_dense_oracle():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(seed=3)
    beta = 0.02
    omegas = np.linspace(0.5, 3.0, 5)
    rng = np.random.default_rng(4)
    B = rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
    Kc = (1 + 1j * beta) * K_flat
    U = np.asarray(
        direct_sweep(jnp.asarray(Kc), jnp.asarray(M_flat), jnp.asarray(B),
                     jnp.asarray(omegas), jnp.asarray(rows), jnp.asarray(cols),
                     n, chunk=2)
    )
    U_ref = _solve_reference(Kd, Md, beta, omegas, B)
    np.testing.assert_allclose(U, U_ref, rtol=1e-9, atol=1e-11)


def _loss_factory(engine, n, rows, cols, K_flat, M_flat, omegas, B):
    """Scalar loss theta -> sum |readout|^2 with K = theta0*(1+i theta1)*K0,
    rhs scaled by theta2 — exercises all AD paths."""
    K0 = jnp.asarray(K_flat)
    M0 = jnp.asarray(M_flat)
    Bj = jnp.asarray(B)
    om = jnp.asarray(omegas)
    c = jnp.asarray(np.linspace(0.5, 1.5, n))

    def loss(theta):
        Kc = K0 * theta[0] * (1.0 + 1j * theta[1])
        U = sweep_solve(Kc, M0 * theta[2], Bj * theta[2], om, rows, cols, n,
                        engine=engine, chunk=3)
        y = U @ c
        return jnp.sum(jnp.abs(y) ** 2)

    return loss


def _fd_grad(f, x, eps=1e-6):
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
    return g


def test_gradients_match_fd_both_engines():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(seed=5)
    omegas = np.linspace(0.5, 2.5, 4)
    rng = np.random.default_rng(6)
    B = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    theta = np.array([1.1, 0.05, 0.9])

    for engine in ("modal", "direct"):
        loss = _loss_factory(engine, n, rows, cols, K_flat, M_flat, omegas, B)
        g = np.asarray(jax.grad(loss)(jnp.asarray(theta)))
        g_fd = _fd_grad(loss, theta)
        np.testing.assert_allclose(g, g_fd, rtol=2e-5, err_msg=engine)


def test_engines_agree_on_gradient():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(seed=7)
    omegas = np.linspace(0.5, 2.5, 4)
    rng = np.random.default_rng(8)
    B = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    theta = jnp.asarray(np.array([1.0, 0.03, 1.2]))

    g_m = np.asarray(jax.grad(
        _loss_factory("modal", n, rows, cols, K_flat, M_flat, omegas, B))(theta))
    g_d = np.asarray(jax.grad(
        _loss_factory("direct", n, rows, cols, K_flat, M_flat, omegas, B))(theta))
    np.testing.assert_allclose(g_m, g_d, rtol=1e-7)


def test_hessian_through_modal():
    """jax.hessian must compose with the custom_jvp (the reference needed a
    dedicated batching mode 4 for this — Sparse.py:267-270)."""
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(n=12, seed=9)
    omegas = np.linspace(0.5, 1.5, 3)
    rng = np.random.default_rng(10)
    B = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    loss = _loss_factory("modal", n, rows, cols, K_flat, M_flat, omegas, B)

    theta = np.array([1.0, 0.02, 1.0])
    H = np.asarray(jax.hessian(loss)(jnp.asarray(theta)))
    assert H.shape == (3, 3)
    np.testing.assert_allclose(H, H.T, rtol=1e-8)

    # FD check of one Hessian column via grad
    eps = 1e-5
    g = lambda x: np.asarray(jax.grad(loss)(jnp.asarray(x)))
    col0 = (g(theta + np.array([eps, 0, 0])) - g(theta - np.array([eps, 0, 0]))) / (
        2 * eps
    )
    np.testing.assert_allclose(H[:, 0], col0, rtol=2e-4)


def test_jit_and_vmap_compose():
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(n=10, seed=11)
    omegas = np.linspace(0.5, 1.5, 3)
    rng = np.random.default_rng(12)
    B = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    loss = jax.jit(_loss_factory("modal", n, rows, cols, K_flat, M_flat, omegas, B))
    thetas = jnp.asarray(np.array([[1.0, 0.02, 1.0], [1.2, 0.04, 0.8]]))
    vals = np.asarray(jax.vmap(loss)(thetas))
    np.testing.assert_allclose(vals[0], float(loss(thetas[0])), rtol=1e-10)


def test_jacobi_eigh_matches_lapack():
    from plate_inverse_problem_tpu.ops.jacobi_eigh import (
        jacobi_eigh, generalized_jacobi_eigh,
    )

    rng = np.random.default_rng(42)
    for n_dim, blk in ((90, 32), (260, 64), (517, 128)):
        A = rng.standard_normal((n_dim, n_dim))
        A = A + A.T
        lam, V = jacobi_eigh(jnp.asarray(A), block=blk)
        lam, V = np.asarray(lam), np.asarray(V)
        lam_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(lam, lam_ref, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(V.T @ V, np.eye(n_dim), atol=1e-11)
        # residuals are limited by eigenvalue clustering (random-matrix
        # spectra); what the modal solver needs is subspace/resolvent
        # accuracy, checked end-to-end in test_modal_sweep_with_jacobi_basis
        np.testing.assert_allclose(A @ V, V * lam[None, :], atol=2e-5)


def test_generalized_jacobi_eigh():
    import scipy.linalg as sla
    from plate_inverse_problem_tpu.ops.jacobi_eigh import generalized_jacobi_eigh

    rng = np.random.default_rng(7)
    n_dim = 200
    A = rng.standard_normal((n_dim, n_dim))
    K = A + A.T
    Bm = rng.standard_normal((n_dim, n_dim))
    M = Bm @ Bm.T + n_dim * np.eye(n_dim)
    lam, Z = generalized_jacobi_eigh(jnp.asarray(K), jnp.asarray(M), block=64)
    lam, Z = np.asarray(lam), np.asarray(Z)
    lam_ref = sla.eigh(K, M, eigvals_only=True)
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(Z.T @ M @ Z, np.eye(n_dim), atol=1e-10)


def test_modal_sweep_with_jacobi_basis():
    """End-to-end: modal solve using the Jacobi basis matches the LU oracle."""
    from plate_inverse_problem_tpu.ops.spectral import modal_basis_from_flat
    from plate_inverse_problem_tpu.ops.sweep import _modal_solve

    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(n=40, seed=13)
    beta = 0.015
    omegas = np.linspace(0.5, 2.0, 5)
    rng = np.random.default_rng(14)
    B = rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
    Kc = (1 + 1j * beta) * K_flat

    lam, Z = modal_basis_from_flat(
        jnp.asarray(K_flat), jnp.asarray(M_flat), rows, cols, n, method="jacobi"
    )
    U = np.asarray(_modal_solve(
        jnp.asarray(Kc), jnp.asarray(M_flat), jnp.asarray(B), Z, lam,
        jnp.asarray(omegas), jnp.asarray(rows), jnp.asarray(cols),
    ))
    U_ref = _solve_reference(Kd, Md, beta, omegas, B)
    np.testing.assert_allclose(U, U_ref, rtol=1e-7, atol=1e-9)


def test_modal_truncation_approximates():
    """n_modes truncation: low-frequency response approximated by the leading
    modes, exact as n_modes -> n."""
    n, rows, cols, K_flat, M_flat, Kd, Md = _random_system(n=30, seed=21)
    beta = 0.01
    omegas = np.asarray([0.05])  # well below the spectrum: quasi-static
    rng = np.random.default_rng(22)
    B = rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
    Kc = (1 + 1j * beta) * K_flat

    U_full = np.asarray(modal_sweep(jnp.asarray(Kc), jnp.asarray(M_flat),
                                    jnp.asarray(B), jnp.asarray(omegas),
                                    rows, cols, n, refine_steps=0))
    U_tr = np.asarray(modal_sweep(jnp.asarray(Kc), jnp.asarray(M_flat),
                                  jnp.asarray(B), jnp.asarray(omegas),
                                  rows, cols, n, n_modes=n, refine_steps=0))
    np.testing.assert_allclose(U_tr, U_full, rtol=1e-9)

    # truncated basis stays a bounded approximation of the quasi-static solve
    U_t2 = np.asarray(modal_sweep(jnp.asarray(Kc), jnp.asarray(M_flat),
                                  jnp.asarray(B), jnp.asarray(omegas),
                                  rows, cols, n, n_modes=20, refine_steps=0))
    ref = _solve_reference(Kd, Md, beta, omegas, B)
    full_err = np.linalg.norm(U_full - ref)
    tr_err = np.linalg.norm(U_t2 - ref)
    assert full_err < 1e-8 * np.linalg.norm(ref)
    assert tr_err < np.linalg.norm(ref)  # bounded, not exact
