"""Device-side LOBPCG band basis (ops/lobpcg.py).

The factorization-free alternative to the ARPACK host basis: validates the
eigensolver itself against scipy on a synthetic ill-conditioned pencil, the
basis against band_basis_host on the real equilibrated plate operator, and
the end-to-end FRF of Problem(basis='lobpcg') on both preconditioner tiers.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
from plate_inverse_problem_tpu.ops.lobpcg import (
    band_basis_lobpcg, lobpcg_pencil, _make_applies,
)


def test_lobpcg_pencil_synthetic():
    """Lowest eigenpairs of an SPD pencil with 1e8 spectral spread."""
    rng = np.random.default_rng(0)
    n, m = 400, 16
    d = np.logspace(0, 8, n)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    K = (Q * d) @ Q.T
    K = 0.5 * (K + K.T)
    M = np.diag(rng.uniform(0.5, 2.0, n))
    rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    rows, cols = rows.ravel(), cols.ravel()
    invK32 = np.linalg.inv(K).astype(np.float32)

    precond = {"kind": "dense", "refine": 4}
    apply_KM, apply_T = _make_applies(n, band=None, precond=precond)
    opd = {"K64": jnp.asarray(K.ravel()), "M64": jnp.asarray(M.ravel()),
           "rows": jnp.asarray(rows), "cols": jnp.asarray(cols),
           "invK32": jnp.asarray(invK32)}
    X0 = rng.standard_normal((m + 8, n))
    X0 = np.asarray(jax.jit(apply_T)(opd, jnp.asarray(X0)))
    lam, X, relres, it = lobpcg_pencil(apply_KM, apply_T, opd, X0,
                                       n_wanted=m, tol=1e-6, maxiter=60)
    assert it < 60, f"did not converge in 60 iterations (relres {relres})"

    lam_ref, _ = spla.eigsh(sp.csr_matrix(K), k=m, M=sp.csr_matrix(M),
                            sigma=0, which="LM")
    lam_ref = np.sort(lam_ref)
    np.testing.assert_allclose(lam[:m], lam_ref, rtol=1e-7)
    # M-orthonormality of the returned block
    G = X[:m] @ (M @ X[:m].T)
    assert np.abs(G - np.eye(m)).max() < 1e-10


@pytest.fixture(scope="module")
def plate_pencil():
    """Equilibrated plate pencil + the mixed engine's dense preconditioner."""
    from plate_inverse_problem_tpu.ops.dense import inv_refined
    from plate_inverse_problem_tpu.ops.scatter import to_dense

    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
        ny=2)
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    p = pip.Problem(geom, mat, acc)
    op = p.op
    n = p.n_free
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(
        np.asarray(p.parameters), 0.0))
    K_flat = sum(
        Av[i].real * op.mats["A" + s] + Bv[i].real * op.mats["B" + s]
        + Dv[i].real * op.mats["D" + s]
        for i, s in enumerate(MODULI_INDICES))
    rows, cols = op.pattern.rows, op.pattern.cols
    dvals = np.zeros(n)
    dmask = rows == cols
    np.add.at(dvals, rows[dmask], np.abs(K_flat[dmask]))
    s_eq = 1.0 / np.sqrt(np.where(dvals > 0, dvals, 1.0))
    ss = s_eq[rows] * s_eq[cols]
    K = K_flat * ss
    M = np.asarray(p.MInertia) * ss
    invK32 = jax.jit(lambda d, r, c: inv_refined(to_dense(d, r, c, n)))(
        jnp.asarray(K, jnp.float32), jnp.asarray(rows), jnp.asarray(cols))
    return dict(n=n, rows=rows, cols=cols, K=K, M=M, invK32=invK32)


def test_band_basis_lobpcg_matches_arpack(plate_pencil):
    """Same band coverage and span as the ARPACK host basis, no splu."""
    from plate_inverse_problem_tpu.ops.mixed import band_basis_host

    d = plate_pencil
    om_max = 2 * np.pi * 600.0
    W_a, lam_a = band_basis_host(d["K"], d["M"], d["rows"], d["cols"],
                                 d["n"], omega_max=om_max)
    spec = {"kind": "dense", "invK32": d["invK32"], "refine": 8}
    W_l, lam_l = band_basis_lobpcg(d["K"], d["M"], d["rows"], d["cols"],
                                   d["n"], om_max, precond=spec)
    m = min(W_a.shape[1], W_l.shape[1])
    np.testing.assert_allclose(lam_l[:m], lam_a[:m], rtol=1e-6)
    # principal angles between the spans, in the M inner product
    Msp = sp.csr_matrix((d["M"], (d["rows"], d["cols"])),
                        shape=(d["n"], d["n"]))
    Msp = 0.5 * (Msp + Msp.T)
    svals = np.linalg.svd(W_l[:, :m].T @ (Msp @ W_a[:, :m]),
                          compute_uv=False)
    assert svals.min() > 1.0 - 1e-6


def _frf(problem, freqs):
    return np.asarray(problem.getFRFunction()(freqs, problem.parameters))


def test_problem_lobpcg_dense_tier_frf():
    """Problem(basis='lobpcg') matches the f64 splu oracle on the dense
    preconditioner tier."""
    from plate_inverse_problem_tpu.diagnostics.oracle import frf_oracle

    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
        ny=2)
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    freqs = np.linspace(40.0, 600.0, 16)
    p = pip.Problem(geom, mat, acc, engine="mixed", basis="lobpcg")
    fr = _frf(p, freqs)
    ref = frf_oracle(p, freqs)
    rel = np.abs(fr - ref) / np.abs(ref)
    assert rel.max() < 1e-6, f"worst rel err {rel.max():.2e}"


def test_problem_lobpcg_band_twogrid_tier_frf():
    """basis='lobpcg' through the band layout + two-grid preconditioner —
    the configuration of the >12k-DOF scale tier."""
    from plate_inverse_problem_tpu.diagnostics.oracle import frf_oracle

    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
        ny=4)
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    freqs = np.linspace(40.0, 600.0, 8)
    p = pip.Problem(geom, mat, acc, engine="mixed", basis="lobpcg",
                    operator_layout="band", precond="mg")
    fr = _frf(p, freqs)
    assert p._precond_resolved == "mg"
    ref = frf_oracle(p, freqs)
    rel = np.abs(fr - ref) / np.abs(ref)
    assert rel.max() < 1e-5, f"worst rel err {rel.max():.2e}"
