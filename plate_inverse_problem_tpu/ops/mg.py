"""Multilevel (geometric) preconditioner — the 100k-DOF complement solver.

The mixed engine's static preconditioner is a dense f32 inverse (O(n^2)
memory / O(n^3) host build — fine to ~20k DOF).  This module builds the
O(nnz) replacement: a V-cycle

    C(r) = S(r) + P C_coarse(P^T (r - K S(r))) ,  S = Chebyshev smoothing

with *geometric* prolongations P evaluated through the actual FE bases
(P1 for the membrane fields, Morley values/normal-derivatives for bending) —
the same interpolation machinery that builds the readout operators.  Coarse
operators are Galerkin (P^T K P, host scipy); the coarsest level is a small
dense inverse.

The whole cycle runs in f32 on device: it is only a *preconditioner* —
the surrounding deflated-Richardson iteration (ops/mixed.py) computes its
residuals in exact split-complex f64, so preconditioner roundoff costs
iterations, never accuracy.  On-device application is all flat-pattern
SpMV + one small GEMM, so it inherits the mixed engine's
compile-friendliness.

Contraction measured on the real equilibrated plate operator:
~0.29 two-grid, ~0.3-0.4 multilevel (tests/test_mg.py).
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

    # all blocks assembled with bulk numpy (a Python per-DOF loop here cost
    # ~10 minutes of the 100k-tier host prep)
    rows_l, cols_l, vals_l = [], [], []
    dofs_c_w = mdc["dofs"]  # (Tc, 6) in w-local numbering

    # ---- w vertex DOFs: coarse Morley value at fine nodes -----------------
    tri_v, _ = locate_points(coarse_mesh, fine_mesh.nodes)
    phi_v, _ = morley_point_eval(mdc, tri_v, fine_mesh.nodes)
    rows_l.append(np.repeat(w_off_f + np.arange(Vf), 6))
    cols_l.append((w_off_c + dofs_c_w[tri_v]).ravel())
    vals_l.append(phi_v.ravel())

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
    rows_l.append(np.repeat(w_off_f + Vf + np.arange(Ef), 6))
    cols_l.append((w_off_c + dofs_c_w[tri_e]).ravel())
    vals_l.append(dn.ravel())

    # ---- membrane u, v: coarse P1 at fine nodes ----------------------------
    if three_field:
        tri_p, bary_p = locate_points(coarse_mesh, fine_mesh.nodes)
        c_verts = coarse_mesh.triangles[tri_p]               # (Vf, 3)
        rows_l.append(np.repeat(np.arange(Vf), 3))           # u block
        cols_l.append(c_verts.ravel())
        vals_l.append(bary_p.ravel())
        rows_l.append(np.repeat(Vf + np.arange(Vf), 3))      # v block
        cols_l.append((Vc + c_verts).ravel())
        vals_l.append(bary_p.ravel())

    P_full = sp.csr_matrix(
        (np.concatenate(vals_l),
         (np.concatenate(rows_l), np.concatenate(cols_l))),
        shape=(nf_full, nc_full),
    )
    return P_full[fine_free_idx][:, coarse_free_idx].tocsr()


def _dinv_lmax(K):
    """Inverse diagonal and a GUARANTEED upper bound on lambda_max(D^-1 K).

    The bound must not under-estimate: Chebyshev smoothing DIVERGES on any
    mode above its interval, and a 30-step power iteration under-estimated
    lambda_max enough at n ~ 20k that the whole multigrid cycle amplified
    2-3x per application (measured).  Gershgorin over rows of D^-1 K is
    cheap and safe; the <= 2x looseness only mildly softens the smoother."""
    import scipy.sparse as sp

    d = np.asarray(K.diagonal())
    d = np.where(np.abs(d) > 0, d, 1.0)
    dinv = 1.0 / d
    absK = abs(sp.csr_matrix(K))
    row_sums = np.asarray(absK.sum(axis=1)).ravel()
    lmax = float((np.abs(dinv) * row_sums).max())
    return dinv, lmax


def _pin_dead(Kc, P_csr):
    """Pin coarse DOFs whose P column is empty (e.g. a sliver coarse
    triangle near a curved hole that contains no fine sample point) — they
    receive zero restricted residual and feed nothing back through P, so a
    unit diagonal is exact and keeps Kc nonsingular."""
    import scipy.sparse as sp

    dead = np.asarray(P_csr.multiply(P_csr).sum(axis=0)).ravel() == 0.0
    if dead.any():
        keep = sp.diags((~dead).astype(Kc.dtype))
        Kc = keep @ Kc @ keep + sp.diags(dead.astype(Kc.dtype))
    return Kc


def build_multilevel_host(K_flat, rows, cols, n: int, P_csr_list,
                          row_scale=None, invert_coarse: bool = True):
    """Host-side data for the multilevel V-cycle on an equilibrated SPD K.

    ``P_csr_list``: geometric prolongations finest-first — entry ``l`` maps
    level ``l+1`` DOFs to level ``l`` DOFs (level 0 = the fine operator).
    ``row_scale``: the fine-grid equilibration vector s (K here is
    S K_phys S).  The prolongations are built in PHYSICAL DOF space, so the
    finest one must be mapped into scaled variables, P~ = S^-1 P — without
    this the coarse correction cannot represent the scaled smooth error and
    the cycle stalls near rate ~0.95; with it the measured rate is ~0.29
    (tests/test_mg.py).  Coarser levels keep physical variables throughout
    (the Chebyshev smoother normalizes through D^-1, so no per-level
    re-equilibration is needed).

    Returns ``(arrays, static)``: ``arrays`` is a pytree of numpy arrays
    (per-level inverse diagonals, flat coarse operators, flat prolongations,
    coarsest dense inverse) meant to travel as jit *arguments*; ``static``
    holds the Python-scalar metadata (per-level lambda_max, DOF counts) to
    be baked in at trace time.  Everything is f32 — the cycle is a
    preconditioner (see module docstring).
    """
    import scipy.sparse as sp

    K = sp.csc_matrix((K_flat, (rows, cols)), shape=(n, n))
    K = 0.5 * (K + K.T)

    levels = []
    lmaxs = []
    ns = [n]
    for li, P in enumerate(P_csr_list):
        if li == 0 and row_scale is not None:
            P = (sp.diags(1.0 / np.asarray(row_scale)) @ P).tocsr()
        dinv, lmax = _dinv_lmax(K)
        lv = {"dinv": dinv.astype(np.float32)}
        if li > 0:
            Kcoo = K.tocoo()
            lv |= {
                "Kf": Kcoo.data.astype(np.float32),
                "rows": Kcoo.row.astype(np.int32),
                "cols": Kcoo.col.astype(np.int32),
            }
        Pcoo = P.tocoo()
        lv |= {
            "P_rows": Pcoo.row.astype(np.int32),
            "P_cols": Pcoo.col.astype(np.int32),
            "P_vals": Pcoo.data.astype(np.float32),
        }
        levels.append(lv)
        lmaxs.append(lmax)
        ns.append(P.shape[1])

        K = _pin_dead((P.T @ (K @ P)).tocsc(), P)
        K = 0.5 * (K + K.T)

    arrays = {"levels": tuple(levels)}
    if invert_coarse:
        # sparse LU + identity solves: no O(n^3) dense work and no f64
        # dense copy of K on the host
        import scipy.sparse.linalg as spla

        lu = spla.splu(K.tocsc())
        Kc_inv = lu.solve(np.eye(K.shape[0]))
        arrays["Kc_inv32"] = np.ascontiguousarray(Kc_inv.astype(np.float32))
    else:
        # hand back the sparse Galerkin coarse operator so the caller can
        # scatter + invert it ON DEVICE (the coarsest level may be ~20k
        # rows: shipping its n^2 inverse through a slow host->device
        # transport costs minutes, the flat data is a few MB)
        Kcoo = K.tocoo()
        arrays["Kc_coo"] = {"data": Kcoo.data.astype(np.float32),
                            "rows": Kcoo.row.astype(np.int32),
                            "cols": Kcoo.col.astype(np.int32),
                            "n": K.shape[0]}
    static = {"lmax": tuple(lmaxs), "n": tuple(ns)}
    return arrays, static


def _chebyshev_smooth(mg, K_mv, r, e0=None, steps: int = 4,
                      spectrum_fraction: float = 8.0):
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


def twogrid_apply(band0, dinv, lmax, Pt, Kc_inv, r32, layout, rl,
                  slots, smooth_steps: int = 4):
    """Symmetric two-grid cycle in pure MXU ops (the band-tier
    preconditioner): Chebyshev pre-smooth on the f32 band operator,
    exact coarse correction through the rectangular block-band
    prolongation and a dense coarse inverse, Chebyshev post-smooth.
    No scatter or gather anywhere — band GEMMs, the P GEMM pair, and
    one (nc, nc) GEMM."""
    import jax

    from .band import band_mv_f32, rect_band_mv, rect_band_tmv

    def K_mv(x):
        return band_mv_f32(band0, x, layout)

    sm = {"dinv": dinv, "lmax": lmax}
    e = _chebyshev_smooth(sm, K_mv, r32, steps=smooth_steps)
    res = r32 - K_mv(e)
    rc = rect_band_tmv(Pt, res, rl, slots)
    ec = jnp.einsum("ij,...j->...i", Kc_inv, rc,
                    precision=jax.lax.Precision.HIGHEST)
    e = e + rect_band_mv(Pt, ec, rl, slots)
    return _chebyshev_smooth(sm, K_mv, r32, e0=e, steps=smooth_steps)


def multilevel_apply(arrays, static, K0_flat, rows0, cols0, r,
                     smooth_steps: int = 4, w_cycle: bool | None = None,
                     band0=None, layout=None):
    """One symmetric multigrid cycle: Chebyshev pre-smooth, recursive coarse
    correction, Chebyshev post-smooth at every level.  Pure flat-pattern
    ops + one small GEMM at the coarsest level — device friendly, O(nnz)
    memory.  ``r`` may be batched (..., n); compute is f32 throughout (the
    fine operator ``K0_flat`` arrives as a runtime argument and is cast
    once).  Returns the correction in ``r``'s dtype.

    ``w_cycle=True`` applies TWO recursive corrections per coarse visit
    (a W-cycle): on the 2D plate hierarchy the coarse work shrinks ~4x per
    level, so the extra visits cost ~25% while holding the multilevel rate
    near the two-grid rate (measured: 0.49 V vs ~0.3 W at three levels).

    ``band0``/``layout``: optional RCM block-tridiagonal f32 form of the
    fine operator (ops/band.py) — replaces the level-0 scatter SpMV with
    MXU batched matmuls (6x measured at n=82k); the caller's pattern and
    residuals must already live in the layout's RCM ordering.
    """
    levels = arrays["levels"]
    lmaxs = static["lmax"]
    ns = static["n"]
    in_dtype = r.dtype
    K032 = K0_flat.astype(jnp.float32)
    if w_cycle is None:
        # with a single smoothed level the coarse solve is the EXACT dense
        # inverse — a second corrective visit would only re-solve the same
        # system (one wasted GEMM + SpMV per cycle)
        w_cycle = len(levels) >= 2

    def level_mv(l):
        if l == 0:
            if band0 is not None:
                from .band import band_mv_f32

                # DEFAULT precision: preconditioner arithmetic (see
                # ops/mixed.precond) — bf16 multiplies, f32 accumulate
                return lambda x: band_mv_f32(band0, x, layout,
                                             precision=jax.lax.Precision.DEFAULT)
            Kf, rws, cls = K032, rows0, cols0
        else:
            lv = levels[l]
            Kf, rws, cls = lv["Kf"], lv["rows"], lv["cols"]
        return lambda x: spmv_flat(Kf, rws, cls, x, ns[l])

    def coarse_correct(l, rc):
        """Approximately solve K_l e = rc by one (or two) recursive
        cycles; level len(levels) is the exact dense inverse."""
        ec = cycle(l, rc)
        if w_cycle and l < len(levels):
            ec = ec + cycle(l, rc - level_mv(l)(ec))
        return ec

    def cycle(l, rl):
        if l == len(levels):
            return jnp.einsum("ij,...j->...i", arrays["Kc_inv32"], rl)
        lv = levels[l]
        K_mv = level_mv(l)
        sm = {"dinv": lv["dinv"], "lmax": lmaxs[l]}
        e = _chebyshev_smooth(sm, K_mv, rl, steps=smooth_steps)
        res = rl - K_mv(e)
        rc = spmv_flat(lv["P_vals"], lv["P_cols"], lv["P_rows"], res,
                       ns[l + 1])
        e = e + spmv_flat(lv["P_vals"], lv["P_rows"], lv["P_cols"],
                          coarse_correct(l + 1, rc), ns[l])
        return _chebyshev_smooth(sm, K_mv, rl, e0=e, steps=smooth_steps)

    return cycle(0, r.astype(jnp.float32)).astype(in_dtype)
