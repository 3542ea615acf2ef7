"""Device-side LOBPCG band basis — the factorization-free basis builder.

Why: the mixed engine's band basis (`ops.mixed.band_basis_host`) is the
LAST f64 factorization in the pipeline — ARPACK shift-invert needs a host
`splu` of the equilibrated reference stiffness, which at the 50-100k-DOF
tier costs tens of seconds of serial host time (and scales superlinearly).
Everything LOBPCG needs instead is already device-resident:

* the exact f64 K/M applications (flat scatter SpMV or the RCM
  block-tridiagonal band GEMM of ops/band.py), and
* the mixed engine's own f32 complement preconditioner (refined dense
  inverse below ~12k DOF, the scatter-free band two-grid above) as
  T ~= K^-1 — the same object that preconditions the frequency sweep.

With T ~= K^-1 the preconditioned pencil has O(1) effective condition
number, so the 1e8 raw spectral spread of the biharmonic operator (which
makes UNpreconditioned device eigensolvers hopeless) never enters the
iteration count.

Structure: the loop is HOST-orchestrated — this is init-time prep, like
the ARPACK path it replaces — with the heavy panel work (operator
applications, preconditioner cycles, Gram matrices, panel recombinations)
in two jitted device programs that take every operator array as an
ARGUMENT (closures over device arrays are fatal to the AOT compiler —
CLAUDE.md), while the small (3b, 3b) dense reductions run on the host in
numpy f64: the TPU has no f64 factorizations and its eigh compile time
grows superlinearly with size.  Per-iteration host<->device traffic is
O(b^2) floats.

Algorithm: Knyazev's LOBPCG on the generalized pencil (K, M), soft
locking, with basis conditioning done through the host eigendecomposition
of the M-Gram (an SVQB-style whitening: near-dependent directions in
[X W P] are dropped by a relative eigenvalue threshold instead of
crashing a Cholesky).

Reference counterpart: the role of jax_plate's UMFPACK-factorized modal
prep (Problem.py getFRFunction's eigensolve); redesigned here so no
factorization of the fine operator is ever needed.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .scatter import spmv_flat


# ---------------------------------------------------------------------------
# reduced (host, numpy f64) Rayleigh-Ritz with SVQB-style whitening
# ---------------------------------------------------------------------------

def _reduced_rr(A: np.ndarray, B: np.ndarray, nx: int, drop_tol: float = 1e-12):
    """Host Rayleigh-Ritz for the reduced pencil (A, B), B ~ Gram (SPSD).

    Whitens B by its eigendecomposition, dropping directions whose B-mass
    is below ``drop_tol`` relative to the largest (near-dependent W/P
    columns — expected as modes converge, not an error), then solves the
    whitened standard problem.  Returns (theta (nx,), C (s, nx)) with C
    B-orthonormal: C^T B C = I.
    """
    A = 0.5 * (A + A.T)
    B = 0.5 * (B + B.T)
    d, V = np.linalg.eigh(B)
    keep = d > drop_tol * max(d[-1], np.finfo(np.float64).tiny)
    # never drop below the block size we must return
    if int(keep.sum()) < nx:
        keep = np.zeros_like(keep)
        keep[-nx:] = True
    Y = V[:, keep] / np.sqrt(d[keep])
    Ar = Y.T @ A @ Y
    lam, Q = np.linalg.eigh(0.5 * (Ar + Ar.T))
    C = Y @ Q[:, :nx]
    return lam[:nx], C


# ---------------------------------------------------------------------------
# device programs (jitted by the driver with opdata as arguments)
# ---------------------------------------------------------------------------

def _expand_body(apply_KM, apply_T, opd, X, P, KX, MX, KP, MP, theta,
                 use_p: bool):
    """Residual -> preconditioned direction -> subspace Grams.

    All panels are (b, n) f64.  Returns the new W panel with its K/M
    images (device-resident for the recombination step) plus the reduced
    Gram matrices and squared residual norms (tiny, for the host)."""
    R = KX - theta[:, None] * MX
    W = apply_T(opd, R)
    # Convergence measure: ||T r|| / ||x||.  The RAW residual of a low mode
    # is dominated by its high-mode error components AMPLIFIED by lam_max
    # (1e8 spectral spread), so ||r||/theta only fires at eps64 — useless.
    # T ~= K^-1 undoes exactly that amplification: e = K^-1 r is the
    # eigenvector error itself (to first order), so ||T r||/||x|| tracks
    # the subspace angle the band basis actually needs.
    rn2 = jnp.sum(W * W, axis=1) / jnp.sum(X * X, axis=1)
    KW, MW = apply_KM(opd, W)
    # Normalize W in the M-NORM, like X (||x||_M = 1 by construction).
    # The mass matrix of the equilibrated pencil has O(1e-11) entries, so
    # a 2-normalized W row has M-norm ~3e5 smaller than an X row: the
    # combined Gram B would span ~11 decades and the f64 whitening would
    # lose the W directions to roundoff (measured: stagnation at relres
    # ~4 with a spectrally-excellent T).  M-normalizing makes B ~ I-ish.
    nw = jnp.sqrt(jnp.abs(jnp.einsum("bn,bn->b", W, MW)))
    nw = jnp.where(nw > 0, nw, 1.0)[:, None]
    W = W / nw
    KW = KW / nw
    MW = MW / nw
    if use_p:
        S = jnp.concatenate([X, W, P], axis=0)
        KS = jnp.concatenate([KX, KW, KP], axis=0)
        MS = jnp.concatenate([MX, MW, MP], axis=0)
    else:
        S = jnp.concatenate([X, W], axis=0)
        KS = jnp.concatenate([KX, KW], axis=0)
        MS = jnp.concatenate([MX, MW], axis=0)
    A = S @ KS.T
    B = S @ MS.T
    return W, KW, MW, A, B, rn2


def _combine_body(X, W, P, KX, MX, KW, MW, KP, MP, C, Cp, use_p: bool):
    """New (X, P) blocks and their K/M images as reduced combinations —
    pure panel matmuls, no operator application."""
    if use_p:
        S = jnp.concatenate([X, W, P], axis=0)
        KS = jnp.concatenate([KX, KW, KP], axis=0)
        MS = jnp.concatenate([MX, MW, MP], axis=0)
    else:
        S = jnp.concatenate([X, W], axis=0)
        KS = jnp.concatenate([KX, KW], axis=0)
        MS = jnp.concatenate([MX, MW], axis=0)
    Xn = C.T @ S
    KXn = C.T @ KS
    MXn = C.T @ MS
    Pn = Cp.T @ S
    KPn = Cp.T @ KS
    MPn = Cp.T @ MS
    # M-renormalize P: its rows shrink as modes converge (P -> 0), which
    # would starve the next Gram of its directions' scale
    npn = jnp.sqrt(jnp.abs(jnp.einsum("bn,bn->b", Pn, MPn)))
    npn = jnp.where(npn > 1e-150, npn, 1.0)[:, None]
    Pn = Pn / npn
    KPn = KPn / npn
    MPn = MPn / npn
    return Xn, Pn, KXn, MXn, KPn, MPn


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def lobpcg_pencil(apply_KM, apply_T, opd, X0, *, n_wanted: int,
                  tol: float = 1e-4, maxiter: int = 200):
    """Lowest ``n_wanted`` eigenpairs of the SPD pencil (K, M).

    ``apply_KM(opd, U) -> (KU, MU)`` and ``apply_T(opd, R) -> W`` are
    traceable panel functions over (b, n) f64 whose operator data flows
    through the ``opd`` pytree (jit ARGUMENTS, never closure constants).
    ``X0`` (b, n) is the start block, b >= n_wanted (extra rows act as a
    guard block that accelerates the wanted modes).

    Returns (lam (b,), X (b, n) M-orthonormal, relres (b,), n_iter) as
    host numpy; convergence is judged on the first ``n_wanted`` modes.
    """
    b, n = X0.shape
    if not (0 < n_wanted <= b):
        raise ValueError(f"n_wanted={n_wanted} outside block size {b}")

    expand_first = jax.jit(
        lambda od, X, P, KX, MX, KP, MP, th: _expand_body(
            apply_KM, apply_T, od, X, P, KX, MX, KP, MP, th, False))
    expand_full = jax.jit(
        lambda od, X, P, KX, MX, KP, MP, th: _expand_body(
            apply_KM, apply_T, od, X, P, KX, MX, KP, MP, th, True))
    combine_first = jax.jit(
        lambda X, W, P, KX, MX, KW, MW, KP, MP, C, Cp: _combine_body(
            X, W, P, KX, MX, KW, MW, KP, MP, C, Cp, False))
    combine_full = jax.jit(
        lambda X, W, P, KX, MX, KW, MW, KP, MP, C, Cp: _combine_body(
            X, W, P, KX, MX, KW, MW, KP, MP, C, Cp, True))

    # ---- M-orthonormalize the start block (host chol of the M-Gram) ----
    X = jnp.asarray(X0, jnp.float64)
    KX, MX = jax.jit(apply_KM)(opd, X)
    G = np.asarray(X @ MX.T)
    d, V = np.linalg.eigh(0.5 * (G + G.T))
    keep = d > 1e-12 * d[-1]
    Y = V[:, keep] / np.sqrt(d[keep])
    if int(keep.sum()) < b:
        raise ValueError("start block is M-rank-deficient; use a random X0")
    C0 = jnp.asarray(Y)
    X, KX, MX = C0.T @ X, C0.T @ KX, C0.T @ MX
    theta = np.asarray(jnp.einsum("bn,bn->b", X, KX))

    P = jnp.zeros_like(X)
    KP = jnp.zeros_like(X)
    MP = jnp.zeros_like(X)

    relres = np.full(b, np.inf)
    it = 0
    converged = False
    for it in range(1, maxiter + 1):
        use_p = it > 1
        expand = expand_full if use_p else expand_first
        W, KW, MW, A, B, rn2 = expand(opd, X, P, KX, MX, KP, MP,
                                      jnp.asarray(theta))
        relres = np.sqrt(np.maximum(np.asarray(rn2), 0.0))
        if np.all(relres[:n_wanted] < tol):
            converged = True
            break

        lam, C = _reduced_rr(np.asarray(A), np.asarray(B), b)
        Cp = C.copy()
        Cp[:b, :] = 0.0  # P = the W/P-component of the update (Knyazev)
        Cd = jnp.asarray(C)
        Cpd = jnp.asarray(Cp)
        combine = combine_full if use_p else combine_first
        X, P, KX, MX, KP, MP = combine(X, W, P, KX, MX, KW, MW, KP, MP,
                                       Cd, Cpd)
        theta = lam

    if not converged:
        # maxiter exit: the last combine replaced X/theta AFTER relres was
        # measured — recompute so the returned residuals describe the
        # returned block (one extra panel apply, failure path only)
        *_, rn2 = expand_full(opd, X, P, KX, MX, KP, MP, jnp.asarray(theta))
        relres = np.sqrt(np.maximum(np.asarray(rn2), 0.0))

    # ---- exact M-orthonormalization of the result (host chol) ----------
    order = np.argsort(theta)
    Xh = np.asarray(X)[order]
    MXh = np.asarray(MX)[order]
    lam = np.asarray(theta)[order]
    G = Xh @ MXh.T
    L = np.linalg.cholesky(0.5 * (G + G.T))
    Xh = np.linalg.solve(L, Xh)
    return lam, Xh, relres[order], it


# ---------------------------------------------------------------------------
# the band-basis entry point (drop-in alternative to band_basis_host)
# ---------------------------------------------------------------------------

def _make_applies(n: int, band=None, precond=None):
    """Build (apply_KM, apply_T, opd_extra) from the mixed engine's
    operator/preconditioner data.

    ``band``: {"layout": BandLayout, "Kband", "Mband"} — exact f64 block-
    tridiagonal apply (ops/band.py); None = flat scatter through
    opd["K64"]/opd["M64"]/opd["rows"]/opd["cols"].
    ``precond``: {"kind": "dense", "invK32", "Kref32", "refine"} or
    {"kind": "twogrid", "band0", "dinv", "Pt", "Kc_inv", "slots",
    "lmax", "layout", "rl", "refine"} — the same cycle objects as
    ops/mixed.py's ``precond32``; ``refine`` here is the DEPTH of the
    inner flexible GCR wrapped around the cycle (see ``apply_T``).
    """
    if band is not None:
        layout = band["layout"]

        def apply_KM(opd, U):
            from .band import band_mv
            return (band_mv(opd["Kband"], U, layout),
                    band_mv(opd["Mband"], U, layout))

        def apply_K(opd, U):
            from .band import band_mv
            return band_mv(opd["Kband"], U, layout)
    else:
        def apply_KM(opd, U):
            return (spmv_flat(opd["K64"], opd["rows"], opd["cols"], U, n),
                    spmv_flat(opd["M64"], opd["rows"], opd["cols"], U, n))

        def apply_K(opd, U):
            return spmv_flat(opd["K64"], opd["rows"], opd["cols"], U, n)

    kind = precond["kind"]
    refine = int(precond.get("refine", 8))  # inner GCR depth of apply_T
    if kind == "dense":
        def _cycle(opd, x32):
            return jnp.einsum("ij,...j->...i", opd["invK32"], x32)
    elif kind == "twogrid":
        tg_layout = precond["layout"]
        tg_rl = precond["rl"]
        tg_lmax = precond["lmax"]

        def _cycle(opd, x32):
            from .mg import twogrid_apply
            return twogrid_apply(opd["tg_band0"], opd["tg_dinv"], tg_lmax,
                                 opd["tg_Pt"], opd["tg_Kcinv"], x32,
                                 tg_layout, tg_rl, opd["tg_slots"])
    else:
        raise ValueError(f"Unknown preconditioner kind {kind!r}")

    def apply_T(opd, R):
        """T ~= K_ref^-1 as a FIXED-depth flexible GCR solve — f64
        iterates/residuals/matvecs around the f32 cycle.

        A single f32 preconditioner application is NOT usable as a LOBPCG
        preconditioner: the refined f32 inverse / two-grid cycle carries
        eps32*kappa-level error that is O(1)-or-worse in the stiffest
        directions (measured ~1e2-1e3 on the equilibrated plate operator),
        i.e. it is not spectrally equivalent to K^-1 and not SPD — LOBPCG
        stagnates (the sweep's FGMRES tolerates the same object only
        because it is residual-minimizing, flexible AND keeps f64
        iterates).  An all-f32 inner solve does not fix it either: the f32
        arithmetic floors the inner residual at eps32*kappa ~ O(1)
        (measured; the same floor documented in ops/mixed.py).  The
        working recipe is the mixed engine's own precision placement —
        EXACT f64 operator applications and f64 GCR iterates, only the
        cycle in f32 — which contracts the residual ~1.5 digits per
        iteration in every direction; depth 4-8 then hands LOBPCG a
        spectrally-excellent T.
        """
        x = jnp.zeros_like(R)
        r = R
        qs = []
        zs = []
        for _ in range(refine):
            z = _cycle(opd, r.astype(jnp.float32)).astype(jnp.float64)
            q = apply_K(opd, z)
            for qi, zi in zip(qs, zs):
                a = jnp.einsum("bn,bn->b", q, qi)
                q = q - a[:, None] * qi
                z = z - a[:, None] * zi
            nq = jnp.linalg.norm(q, axis=1, keepdims=True)
            nq = jnp.where(nq > 0, nq, 1.0)
            q = q / nq
            z = z / nq
            qs.append(q)
            zs.append(z)
            g = jnp.einsum("bn,bn->b", r, q)
            x = x + g[:, None] * z
            r = r - g[:, None] * q
        return x

    return apply_KM, apply_T


def band_basis_lobpcg(K_flat_ref: np.ndarray, M_flat: np.ndarray,
                      rows: np.ndarray, cols: np.ndarray, n: int,
                      omega_max: float, *, precond: dict,
                      band_layout=None, band_lin=None,
                      margin: float = 2.5, m_min: int = 16, m_max: int = 256,
                      tol: float = 2e-4, maxiter: int = 250,
                      guard: int | None = None, seed: int = 0):
    """Factorization-free counterpart of ``ops.mixed.band_basis_host``.

    Same contract: returns (W (n, m) f64 M-orthonormal, lam (m,)) covering
    the sweep band [0, (margin * omega_max)^2], growing m adaptively until
    the band edge is covered (or m_max).  The tolerance is deliberately
    modest: the basis only needs to SPAN the low band — the mixed engine
    re-Rayleigh-Ritzes it per theta in f64 and the FGMRES complement
    iteration absorbs residual subspace angle (ops/mixed.py docstring).

    ``precond`` / ``band_layout``+``band_lin``: the mixed engine's own
    preconditioner and operator-layout data (see ``_make_applies``).
    """
    K64 = jnp.asarray(K_flat_ref, jnp.float64)
    M64 = jnp.asarray(M_flat, jnp.float64)
    rows_d = jnp.asarray(rows)
    cols_d = jnp.asarray(cols)

    band = None
    opd = {}
    if band_layout is not None:
        from .band import flat_to_band
        lin_d = jnp.asarray(band_layout.lin if band_lin is None else band_lin)
        # symmetrize exactly as the host paths do: the pattern carries
        # both (i, j) and (j, i) entries already, so the flat data maps in
        # directly
        opd["Kband"] = flat_to_band(K64, band_layout, lin_d)
        opd["Mband"] = flat_to_band(M64, band_layout, lin_d)
        band = {"layout": band_layout}
    else:
        opd["K64"] = K64
        opd["M64"] = M64
        opd["rows"] = rows_d
        opd["cols"] = cols_d

    if precond["kind"] == "dense":
        opd["invK32"] = jnp.asarray(precond["invK32"], jnp.float32)
    elif precond["kind"] == "twogrid":
        opd["tg_band0"] = precond["band0"]
        opd["tg_dinv"] = precond["dinv"]
        opd["tg_Pt"] = precond["Pt"]
        opd["tg_Kcinv"] = precond["Kc_inv"]
        opd["tg_slots"] = precond["slots"]

    apply_KM, apply_T = _make_applies(n, band=band, precond=precond)

    target = (margin * omega_max) ** 2
    rng = np.random.default_rng(seed)
    m = int(min(max(m_min, 8), n - 2))
    X_seed = None
    while True:
        g = min(max(4, m // 8), 32) if guard is None else guard
        bsz = min(m + g, n - 1)
        X0 = rng.standard_normal((bsz, n))
        if X_seed is not None:
            X0[: X_seed.shape[0]] = X_seed
            # T-filter only the NEW random rows (converged rows stay)
            new = jnp.asarray(X0[X_seed.shape[0]:], jnp.float64)
            X0[X_seed.shape[0]:] = np.asarray(jax.jit(apply_T)(opd, new))
        else:
            # one preconditioner pass enriches the low band in the start
            X0 = np.asarray(jax.jit(apply_T)(opd, jnp.asarray(X0)))
        lam, X, relres, it = lobpcg_pencil(
            apply_KM, apply_T, opd, X0, n_wanted=m, tol=tol, maxiter=maxiter)
        if lam[m - 1] >= target or m >= min(m_max, n - 2):
            break
        X_seed = X
        m = int(min(m * 2, m_max, n - 2))

    keep = max(int(np.searchsorted(lam[:m], target)) + 1, m_min)
    keep = min(keep, m)
    return np.ascontiguousarray(X[:keep].T), lam[:keep]
