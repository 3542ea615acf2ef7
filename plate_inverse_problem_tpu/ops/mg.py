"""Two-level (geometric) preconditioner — groundwork for the 100k-DOF tier.

The mixed engine's static preconditioner is a dense f32 inverse (O(n^2)
memory / O(n^3) host build — fine to ~20k DOF).  This module builds the
O(nnz) replacement: a two-level cycle

    C(r) = S(r) + P Kc^{-1} P^T (r - K S(r)) ,  S = damped-Jacobi smoothing

with a *geometric* prolongation P evaluated through the actual FE bases
(P1 for the membrane fields, Morley values/normal-derivatives for bending) —
the same interpolation machinery that builds the readout operators.  The
coarse operator is Galerkin (P^T K P, host scipy), solved by a small dense
inverse.

Status: validated numerically (tests/test_mg.py measures the contraction
rate on the real equilibrated plate operator); not yet the default — the
dense inverse is faster below ~20k DOF.  On-device application is all
flat-pattern SpMV + one small GEMM, so it inherits the mixed engine's
compile-friendliness.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .scatter import spmv_flat


def build_prolongation(fine_mesh, coarse_mesh, fine_free_idx, coarse_free_idx,
                       fine_constrained, coarse_constrained,
                       three_field: bool):
    """Sparse prolongation (fine free DOFs) x (coarse free DOFs).

    DOF layouts follow fem.assembly: Morley w = [vertex values, V + edge
    normal derivatives]; 3-field = [u (V), v (V), w (V+E)].
    Each fine DOF is the corresponding linear functional applied to the
    coarse FE interpolant.
    """
    import scipy.sparse as sp

    from ..fem.morley import build_morley, morley_point_eval
    from ..mesh.locate import locate_points

    mdc = build_morley(coarse_mesh)
    Vf, Ef = fine_mesh.num_nodes, fine_mesh.num_edges
    Vc, Ec = coarse_mesh.num_nodes, coarse_mesh.num_edges
    nf_full = (2 * Vf + Vf + Ef) if three_field else (Vf + Ef)
    nc_full = (2 * Vc + Vc + Ec) if three_field else (Vc + Ec)
    w_off_f = 2 * Vf if three_field else 0
    w_off_c = 2 * Vc if three_field else 0

    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    # ---- w vertex DOFs: coarse Morley value at fine nodes -----------------
    tri_v, _ = locate_points(coarse_mesh, fine_mesh.nodes)
    phi_v, _ = morley_point_eval(mdc, tri_v, fine_mesh.nodes)
    dofs_c_w = mdc["dofs"]  # (Tc, 6) in w-local numbering
    for i in range(Vf):
        for a in range(6):
            add(w_off_f + i, w_off_c + dofs_c_w[tri_v[i], a], phi_v[i, a])

    # ---- w edge DOFs: coarse Morley normal derivative at fine edge mids ---
    ea = fine_mesh.nodes[fine_mesh.edges[:, 0]]
    eb = fine_mesh.nodes[fine_mesh.edges[:, 1]]
    mids = 0.5 * (ea + eb)
    t = eb - ea
    nrm = np.stack([t[:, 1], -t[:, 0]], axis=1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tri_e, _ = locate_points(coarse_mesh, mids)
    _, grads_e = morley_point_eval(mdc, tri_e, mids)
    dn = np.einsum("pjd,pd->pj", grads_e, nrm)  # (Ef, 6)
    for e in range(Ef):
        for a in range(6):
            add(w_off_f + Vf + e, w_off_c + dofs_c_w[tri_e[e], a], dn[e, a])

    # ---- membrane u, v: coarse P1 at fine nodes ----------------------------
    if three_field:
        tri_p, bary_p = locate_points(coarse_mesh, fine_mesh.nodes)
        for i in range(Vf):
            for a in range(3):
                c_vert = coarse_mesh.triangles[tri_p[i], a]
                add(i, c_vert, bary_p[i, a])              # u block
                add(Vf + i, Vc + c_vert, bary_p[i, a])    # v block

    P_full = sp.csr_matrix(
        (np.asarray(vals), (np.asarray(rows), np.asarray(cols))),
        shape=(nf_full, nc_full),
    )
    return P_full[fine_free_idx][:, coarse_free_idx].tocsr()


def build_two_level_host(K_flat, rows, cols, n: int, P_csr,
                         jacobi_weight: float = 0.6, row_scale=None):
    """Host-side data for the two-level cycle on an equilibrated SPD K.

    ``row_scale``: the fine-grid equilibration vector s (K here is S K_phys
    S).  The geometric prolongation is built in PHYSICAL DOF space, so it
    must be mapped into scaled variables, P~ = S^-1 P — without this the
    coarse correction cannot represent the scaled smooth error and the cycle
    stalls near rate ~0.95; with it the measured rate is ~0.29
    (tests/test_mg.py).

    Returns a dict of numpy arrays: inverse diagonal, the Chebyshev
    smoothing interval (lambda_max of D^-1 K from power iteration), the
    Galerkin coarse dense inverse, and the prolongation in flat-COO form
    for on-device SpMV.
    """
    import scipy.sparse as sp

    if row_scale is not None:
        P_csr = (sp.diags(1.0 / np.asarray(row_scale)) @ P_csr).tocsr()

    K = sp.csc_matrix((K_flat, (rows, cols)), shape=(n, n))
    K = 0.5 * (K + K.T)

    d = np.asarray(K.diagonal())
    d = np.where(np.abs(d) > 0, d, 1.0)
    dinv = 1.0 / d

    # lambda_max(D^-1 K) by power iteration (host, one-time)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    lmax = 1.0
    for _ in range(30):
        w = dinv * (K @ v)
        lmax = np.linalg.norm(w)
        v = w / lmax
    lmax *= 1.05  # safety margin

    Kc = (P_csr.T @ (K @ P_csr)).toarray()
    Kc = 0.5 * (Kc + Kc.T)
    # A coarse DOF whose P column is empty (e.g. a sliver coarse triangle
    # near a curved hole that contains no fine sample point) makes Kc
    # singular.  Such a coordinate receives zero restricted residual and
    # feeds nothing back through P, so pinning its diagonal to 1 is exact —
    # the coarse correction is unchanged.
    dead = np.asarray(P_csr.multiply(P_csr).sum(axis=0)).ravel() == 0.0
    if dead.any():
        Kc[dead, :] = 0.0
        Kc[:, dead] = 0.0
        Kc[dead, dead] = 1.0
    Kc_inv = np.linalg.inv(Kc)

    Pcoo = P_csr.tocoo()
    return {
        "jac": jacobi_weight * dinv,
        "dinv": dinv,
        "lmax": float(lmax),
        "Kc_inv32": Kc_inv.astype(np.float32),
        "P_rows": Pcoo.row.astype(np.int32),
        "P_cols": Pcoo.col.astype(np.int32),
        "P_vals": Pcoo.data,
        "nc": P_csr.shape[1],
    }


def _chebyshev_smooth(mg, K_mv, r, e0=None, steps: int = 3,
                      spectrum_fraction: float = 4.0):
    """Chebyshev polynomial smoothing on the interval
    [lmax/spectrum_fraction, lmax] of D^-1 K (the standard AMG smoother —
    targets the high-frequency error the coarse grid cannot see)."""
    dinv = mg["dinv"]
    lmax = mg["lmax"]
    lmin = lmax / spectrum_fraction
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma

    e = jnp.zeros_like(r) if e0 is None else e0
    res = r if e0 is None else r - K_mv(e)
    p = dinv * res / theta
    for _ in range(steps - 1):
        e = e + p
        res = res - K_mv(p)
        rho_new = 1.0 / (2.0 * sigma - rho)
        p = rho_new * rho * p + (2.0 * rho_new / delta) * (dinv * res)
        rho = rho_new
    return e + p


def two_level_apply(mg, K_flat, rows, cols, n: int, r, smooth_steps: int = 3):
    """One symmetric two-level cycle: Chebyshev pre-smooth, coarse
    correction, Chebyshev post-smooth.  Pure flat-pattern ops + one small
    GEMM — device friendly, O(nnz) memory.  ``r`` may be batched (..., n)."""
    Pr, Pc, Pv = mg["P_rows"], mg["P_cols"], mg["P_vals"]
    nc = mg["nc"]

    def K_mv(x):
        return spmv_flat(K_flat, rows, cols, x, n)

    def restrict(x):   # P^T x
        return spmv_flat(Pv, Pc, Pr, x, nc)

    def prolong(x):    # P x
        return spmv_flat(Pv, Pr, Pc, x, n)

    # pre-smooth
    e = _chebyshev_smooth(mg, K_mv, r, steps=smooth_steps)
    res = r - K_mv(e)
    # coarse correction
    rc = restrict(res)
    ec = jnp.einsum("ij,...j->...i", mg["Kc_inv32"], rc.astype(jnp.float32))
    e = e + prolong(ec.astype(r.dtype))
    # post-smooth
    return _chebyshev_smooth(mg, K_mv, r, e0=e, steps=smooth_steps)
