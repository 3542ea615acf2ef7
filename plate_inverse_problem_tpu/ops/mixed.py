"""Mixed-precision frequency sweep: f64-grade accuracy on f32 TPU hardware.

Why: the equilibrated Kirchhoff/laminate operator still has an intrinsic
eigenvalue spread lam_max/lam_1 ~ 1e8 (biharmonic h^-4 growth), so *no*
plain f32 factorization or f32 eigenbasis can resolve the low-frequency
resonances the inverse problem lives on (measured: O(1) FRF errors).  The
reference leans on f64 UMFPACK (InnerState.h) for exactly this reason.

TPUs have no f64 factorizations, but they DO have:

* exact f64 elementwise/gather/scatter arithmetic (the x64 rewriter) —
  residuals and sparse matvecs at 1e-15;
* f64 matmul (emulated, fine for skinny panels);
* fast f32 dense LU / inverse (constant compile cost).

The engine combines them:

1. **Band basis** (host, init-time, theta-independent): the lowest ``m``
   M-orthonormal modes of the equilibrated reference pencil, from ARPACK
   shift-invert in f64 (scipy.sparse.linalg.eigsh).  ``m`` is chosen so the
   band covers the sweep frequencies with margin AND deflates the spectrum
   enough for the complement iteration to contract.
2. **Per-theta Rayleigh-Ritz in f64** (device): Kw = W^T K(theta) W via f64
   SpMV + f64 panel matmuls, small f64 eigh -> band eigenpairs accurate to
   ~1e-5 of each lambda_i — far inside the resonance half-width beta.
3. **Per-frequency solve** = exact band resolvent + deflated Richardson
   iteration on the complement, preconditioned by a *static* f32 dense
   inverse of K(theta_ref) (one GEMM per iteration, MXU speed) or the
   O(nnz) multilevel cycle (ops/mg.py), with residuals computed in
   split-complex f64 (exact).  Contraction rate
   ~ max(omega^2/lam_band_edge, eps32 * kappa_deflated) << 1.

Operator application comes in two layouts: the flat-pattern scatter SpMV
(ops/scatter.py — small problems) and the RCM block-tridiagonal band
(ops/band.py — pure MXU batched matmuls, the >10k-DOF path; measured 2.5x
f64 / 6x f32 over scatter at n=82k).

AD: wrapped in ``lax.custom_linear_solve`` like the other engines — the
solver internals are a numerical method; gradients flow through the c64
matvec parameters with implicit diff at every order.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .scatter import spmv_flat


# ---------------------------------------------------------------------------
# host-side band basis (init time)
# ---------------------------------------------------------------------------

def band_basis_host(K_flat_ref: np.ndarray, M_flat: np.ndarray,
                    rows: np.ndarray, cols: np.ndarray, n: int,
                    omega_max: float, margin: float = 2.5,
                    m_min: int = 16, m_max: int = 256):
    """Lowest-band M-orthonormal modes of the (equilibrated) reference pencil.

    Returns (W (n, m) f64, lam_ref (m,)).  Computed once per Problem with
    ARPACK shift-invert — the f64 factorization happens HERE, on the host,
    where it is cheap; the device never needs one.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    K = sp.csc_matrix((K_flat_ref, (rows, cols)), shape=(n, n))
    M = sp.csc_matrix((M_flat, (rows, cols)), shape=(n, n))
    K = 0.5 * (K + K.T)
    M = 0.5 * (M + M.T)

    target = (margin * omega_max) ** 2
    m = min(m_max, max(m_min, 8), n - 2)
    lam = W = None
    while True:
        lam, W = spla.eigsh(K, k=m, M=M, sigma=0, which="LM")
        order = np.argsort(lam)
        lam, W = lam[order], W[:, order]
        if lam[-1] >= target or m >= min(m_max, n - 2):
            break
        m = min(m * 2, m_max, n - 2)

    # keep modes up to the margin (but at least m_min)
    keep = max(int(np.searchsorted(lam, target)) + 1, m_min)
    keep = min(keep, lam.size)
    lam, W = lam[:keep], W[:, :keep]

    # M-orthonormalize exactly (ARPACK returns M-orthonormal up to tol)
    G = W.T @ (M @ W)
    L = np.linalg.cholesky(0.5 * (G + G.T))
    W = np.linalg.solve(L, W.T).T
    return np.ascontiguousarray(W), lam


def static_preconditioner_host(K_flat_ref, rows, cols, n: int) -> np.ndarray:
    """Dense f32 inverse of the equilibrated reference stiffness.

    The complement preconditioner: one n x n GEMM per Richardson iteration.
    Computed on the host in f64 (scipy sparse LU -> dense solve), downcast.
    For very large n the O(nnz) multilevel cycle (ops/mg.py) replaces it.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    K = sp.csc_matrix((K_flat_ref, (rows, cols)), shape=(n, n))
    lu = spla.splu((0.5 * (K + K.T)).tocsc())
    inv = lu.solve(np.eye(n))
    return np.ascontiguousarray(inv.astype(np.float32))


# ---------------------------------------------------------------------------
# split-complex f64 helpers (complex128 is not a TPU type; f64 pairs are)
# ---------------------------------------------------------------------------

def _spmv64(data64, rows, cols, x64, n):
    return spmv_flat(data64, rows, cols, x64, n)


def _residual_scalar_loss(K_mv, M_mv, beta64, om2_64, b_re, b_im,
                          u_re, u_im):
    """r = b - A u for A = (1 + i beta) K_r - om^2 M (scalar loss factor).

    K_i = beta K_r exactly for the scalar-loss material families, so the
    two K_i matvecs of the general residual are scalar multiples of the
    K_r ones — 4 operator applications instead of 6, batched re/im."""
    uu = jnp.stack([u_re, u_im])
    Ku = K_mv(uu)
    Mu = M_mv(uu)
    Au_re = Ku[0] - beta64 * Ku[1] - om2_64 * Mu[0]
    Au_im = Ku[1] + beta64 * Ku[0] - om2_64 * Mu[1]
    return b_re - Au_re, b_im - Au_im


def _residual_general(K_mv, Ki_mv, M_mv, sign, om2_64, b_re, b_im,
                      u_re, u_im):
    """r = b - A u with A = (K_r + i sign K_i) - om^2 M, all in f64 pairs.

    Uses the *true* imaginary stiffness (not a beta projection), so the
    refinement fixed point is exact for arbitrary complex K — including
    per-modulus loss factors (OrthotropicD4)."""
    uu = jnp.stack([u_re, u_im])
    Ku = K_mv(uu)
    Kiu = Ki_mv(uu)
    Mu = M_mv(uu)
    Au_re = Ku[0] - sign * Kiu[1] - om2_64 * Mu[0]
    Au_im = Ku[1] + sign * Kiu[0] - om2_64 * Mu[1]
    return b_re - Au_re, b_im - Au_im


# ---------------------------------------------------------------------------
# split-complex preconditioned GMRES
# ---------------------------------------------------------------------------
#
# The complement refinement used to be a stationary deflated-Richardson
# iteration.  That diverges in a specific, physical regime: away from the
# reference theta the Ritz band basis carries O(%) leakage, the band <->
# complement coupling it induces is amplified by the near-resonant band
# resolvent (gain ~ 1/(beta*lam_1), Q ~ 300), and the alternating block
# correction then has loop gain > 1 (measured: 64% FRF error at a resonance
# with theta 10-20% off reference — exactly the inverse-problem regime).
# A Krylov method with the SAME operator and preconditioner handles that
# indefinite coupling unconditionally, and typically needs fewer of the
# expensive exact-f64 operator applications.  TPUs have no f64
# factorizations, so the Hessenberg least-squares runs as incremental
# complex Givens rotations — pure scalar f64 arithmetic.

_DEBUG_TRACE = os.environ.get("PIP_MIXED_DEBUG", "") == "1"

# test hook: force the small-batch lane floor (see mixed_sweep) on any
# backend so the padding path is exercised by the CPU test suite
_FORCE_MIN_LANES: int | None = None

# nnz segment length for the entrywise-combined residual apply (A_res_apply):
# bounds the per-frequency-lane (lanes, nnz) HBM temps; module-level so the
# CPU test suite can shrink it to exercise the scanned path on small meshes
_RES_SEG = 1 << 17


def _min_lanes() -> int:
    if _FORCE_MIN_LANES is not None:
        return int(_FORCE_MIN_LANES)
    return 1 if jax.default_backend() == "cpu" else 8
                      # print per-iteration GMRES residuals (diagnostics)
_PRECOND_REFINE = 1   # f32 refinement rounds inside the dense preconditioner
                      # (each round squares down the eps32*kappa error of
                      #  the f32 inverse for one extra GEMM + f32 SpMV.
                      #  Tuned on-chip at the bench tier n=1466/512-pt
                      #  sweep with the restarted f32-basis FGMRES:
                      #  0 -> 3366, 1 -> 3667, 2 -> 3259 solves/s at equal
                      #  delivered accuracy — beyond one round the GEMM
                      #  cost outweighs the iterations it saves)
_MG_REFINE = 1        # refinement rounds around the two-grid/multilevel
                      # cycle (each costs a full extra cycle — pricier
                      # than the dense path's GEMM)


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _pgmres(A_apply, P_apply, bb, x0, tol_rel, tol_abs2, k_max: int,
            anchor: bool = True, n_cycles: int = 1, basis_f32: bool = False,
            r0=None, final_correct=None, final_correct_n: int = 1,
            A_final=None, return_info: bool = False):
    """Flexible (right-preconditioned) GMRES on split-complex f64 pairs,
    restarted: up to ``n_cycles`` cycles of ``k_max`` iterations each.

    ``bb``/``x0``: (2, n) stacked re/im.  ``A_apply``/``P_apply``:
    (2, n) -> (2, n) linear maps (exact f64 operator / band+complement
    preconditioner).  Each cycle runs until its residual ESTIMATE drops
    below ``max(tol, (cycle floor))`` or ``k_max`` iterations; between
    cycles the TRUE f64 residual is evaluated (one extra operator
    application) and the outer loop stops when it is below
    ``max(tol_rel * anchor, sqrt(tol_abs2))`` — so the exit criterion is
    always a genuine f64 residual, never an estimate (the estimate's
    agreement with the truth floors at the basis precision).  The
    INITIAL-residual-relative criterion is deliberate: the rhs here
    carries stiffness-lift components of operator magnitude, so a
    b-relative test is orders too loose for the complement correction the
    iteration is responsible for (x0 already holds the exact band part).

    FLEXIBLE is load-bearing, not a luxury: the preconditioner runs in f32
    (dense inverse GEMM / MG cycle), so it is linear only to ~1e-7
    relative.  Plain right-preconditioned GMRES reconstructs
    ``x = x0 + P(V y)`` assuming exact linearity — with ``|y| ~ |r0|``
    thousands of times the solution-relevant scale, that assumption
    injected O(1) absolute residual error (measured).  FGMRES stores the
    actual preconditioned vectors ``Z_j = P(v_j)`` that defined the
    Hessenberg relation and reconstructs ``x = x0 + Z y`` — exact by
    construction for any P.

    ``basis_f32``: store the Krylov/preconditioned bases (V, Z) in f32 and
    orthogonalize with f32 MXU dots.  The f64 einsum 'dot' on TPU is a
    materialized multiply+reduce running at a fraction of memory speed
    (measured 95 ms per CGS2 round at k=20, 512 lanes, n=1466 — the
    dominant sweep cost); the f32 MXU version is ~20x faster.  Precision
    placement: the OPERATOR application stays f64 (the subspace is built
    from exact matvecs) and the iterates/true residuals stay f64 — only
    the subspace REPRESSENTATION is f32, which caps the residual gain at
    ~3e-7 relative PER CYCLE; the f64 restart squares that down, exactly
    like classic GMRES-IR.  (This is NOT the all-f32 inner solver that
    floors at eps32*kappa_eff and cannot converge at 20k+ DOF — the
    matvec here is exact.)

    Orthogonalization is CGS2 (two rounds of classical Gram-Schmidt):
    batched panel matmuls instead of sequential modified-GS dots — the
    TPU-friendly choice, with the stability of reorthogonalization.
    Unset basis rows are zero, so the batched projections are naturally
    masked — no index juggling inside the while_loop.

    Reference counterpart being replaced: the per-frequency UMFPACK
    numeric factorize+solve loop (InnerState.h:164-308).
    """
    f64 = bb.dtype  # works at f32 too (the inner GMRES-IR solver)
    bd = jnp.float32 if basis_f32 else f64
    n = bb.shape[-1]
    tiny = jnp.asarray(1e-300 if f64 == jnp.float64 else 1e-30, f64)
    # smallest relative residual gain a single cycle can deliver given the
    # basis storage precision; stopping the ESTIMATE there avoids burning
    # iterations the subspace cannot convert into true-residual progress
    floor = 3e-7 if basis_f32 else (1e-15 if f64 == jnp.float64 else 3e-7)

    def cycle(x_in, r0, tol2_in, first: bool, need_true: bool):
        beta0 = jnp.sqrt(jnp.sum(r0 * r0))
        V = jnp.zeros((k_max + 1, 2, n), bd).at[0].set(
            (r0 / jnp.maximum(beta0, tiny)).astype(bd))
        Z = jnp.zeros((k_max, 2, n), bd)
        R = jnp.eye(k_max, dtype=f64)[:, :, None] \
            * jnp.asarray([1.0, 0.0], f64)
        g = jnp.zeros((k_max + 1, 2), f64).at[0, 0].set(beta0)
        cs = jnp.ones((k_max,), f64)
        sn = jnp.zeros((k_max, 2), f64)
        floor2 = (floor * beta0) ** 2

        return _pgmres_cycle_body(
            A_apply, P_apply, bb, x_in, r0, beta0, V, Z, R, g, cs, sn,
            tol2_in, floor2, tol_rel, tol_abs2, k_max, anchor and first,
            need_true, f64, bd, tiny)

    if r0 is None:
        r0 = bb - A_apply(x0)
    tol2_0 = jnp.maximum((tol_rel * jnp.sqrt(jnp.sum(r0 * r0))) ** 2,
                         tol_abs2)
    need_true = n_cycles > 1 or final_correct is not None
    x, r, rn2, tol2 = cycle(x0, r0, tol2_0, True, need_true)
    if n_cycles > 1:
        def o_body(st):
            x, r, rn2, tol2, c = st
            x, r, rn2, tol2 = cycle(x, r, tol2, False, True)
            return x, r, rn2, tol2, c + 1

        def o_cond(st):
            *_, rn2, tol2, c = st
            return jnp.logical_and(rn2 > tol2, c < n_cycles)

        x, r, rn2, tol2, c_fin = jax.lax.while_loop(
            o_cond, o_body, (x, r, rn2, tol2, jnp.int32(1)))
        if _DEBUG_TRACE:
            jax.debug.print("pgmres cycles={c} true_rn={r} tol={t}",
                            c=c_fin, r=jnp.sqrt(rn2), t=jnp.sqrt(tol2))
    if final_correct is not None:
        # final defect correction through the exact (band-resolvent) part
        # of the preconditioner: the norm-based exit cannot see WHERE the
        # residual lives, and residual mass in near-resonant band
        # directions is amplified by the modal Q into the solution.
        # ``A_final`` supplies a residual-GRADE apply (entrywise-combined
        # operator values — see A_res_apply in mixed_sweep): the speed-
        # grade fused apply's combine-last rounding is resonance-aligned
        # and would floor the correction ~25x higher.  When given, the
        # first pass recomputes the residual with it instead of reusing
        # the restart bookkeeping's.
        if A_final is not None:
            r = bb - A_final(x)
        x = x + final_correct(r)
        # The Ritz pairs behind the resolvent carry an O(subspace-angle)
        # defect (K Z != M Z Lam exactly — Z spans the band basis, not the
        # true eigenvectors), so each pass leaves a contracted band error
        # behind rather than none (measured contraction ~1e-2 per pass at
        # n=21k, where one pass floored the FRF at 1.6e-5 and a second
        # reached 1.6e-7).  Extra passes recompute the TRUE residual and
        # correct again — one exact operator application each.
        Af = A_apply if A_final is None else A_final
        for _ in range(max(0, int(final_correct_n) - 1)):
            r = bb - Af(x)
            x = x + final_correct(r)
    if return_info:
        # convergence signal for callers (the iteration caps bound any
        # stagnation silently otherwise).  TWO residuals, because they
        # answer different questions:
        # * rn (sqrt rn2) — the Krylov loop's own exit residual (TRUE f64
        #   whenever final corrections are configured, which forces
        #   need_true): rn <= tol means the iteration CONVERGED rather
        #   than hit its caps;
        # * rn_fin — the true residual of the RETURNED iterate, after the
        #   final band corrections, which deliberately trade residual
        #   norm in benign directions for resonance-amplified solution
        #   error (one extra residual-grade apply to measure).
        Af = A_apply if A_final is None else A_final
        r_fin = bb - Af(x)
        rn_fin = jnp.sqrt(jnp.sum(r_fin * r_fin))
        rn0 = jnp.sqrt(jnp.sum(r0 * r0))
        return x, jnp.sqrt(rn2), rn_fin, rn0, jnp.sqrt(tol2)
    return x


def _pgmres_cycle_body(A_apply, P_apply, bb, x_in, r0, beta0, V, Z, R, g,
                       cs, sn, tol2_in, floor2, tol_rel, tol_abs2,
                       k_max: int, anchor: bool, need_true: bool, f64, bd,
                       tiny):
    """One FGMRES cycle: Arnoldi + Givens LSQ + reconstruction.

    Returns (x_new, r_new, rn2, tol2); ``r_new``/``rn2`` are the TRUE f64
    residual when ``need_true`` (one extra operator application), else the
    incoming residual and the Givens estimate."""
    tinyb = jnp.asarray(1e-30, bd) if bd == jnp.float32 else tiny

    def cdots(V, w):
        """Complex dots <V_k, w> for every basis row in ONE pass over V.

        In f32 these are true MXU contractions; in f64 the einsum is a
        materialized multiply+reduce, where fusing the four component
        contractions into one pass quarters the dominant cost (measured
        320 ms -> ~80 ms per CGS round at n=82k, 32 lanes)."""
        t = jnp.einsum("kcn,dn->kcd", V, w)
        re = t[:, 0, 0] + t[:, 1, 1]
        im = t[:, 0, 1] - t[:, 1, 0]
        return re, im

    def csaxpy(V, hre, him, w):
        """w - sum_k h_k V_k (complex coefficients), one pass over V."""
        coef = jnp.stack(
            [jnp.stack([hre, -him], axis=1),
             jnp.stack([him, hre], axis=1)], axis=1)   # (k, c_out, d)
        return w - jnp.einsum("kcd,kdn->cn", coef, V)

    def body(state):
        V, Z, R, g, cs, sn, j, _, tol2 = state
        z = P_apply(V[j])
        Z = Z.at[j].set(z)
        w = A_apply(z.astype(f64)).astype(bd)
        h1re, h1im = cdots(V, w)
        w = csaxpy(V, h1re, h1im, w)
        h2re, h2im = cdots(V, w)          # CGS2 reorthogonalization
        w = csaxpy(V, h2re, h2im, w)
        hre = (h1re + h2re).astype(f64)
        him = (h1im + h2im).astype(f64)
        hlast = jnp.sqrt(jnp.sum(w * w)).astype(f64)
        V = V.at[j + 1].set(w / jnp.maximum(hlast.astype(bd), tinyb))

        # apply the accumulated rotations to the new column (rotations
        # beyond the current step are identity, so an unmasked scan is
        # exact); entries above k_max never participate (h_{j+1} is
        # handled separately as ``hlast``)
        def rot(i, h):
            hre, him = h
            a = (hre[i], him[i])
            b = (hre[i + 1], him[i + 1])
            s = (sn[i, 0], sn[i, 1])
            top = _cmul((cs[i], 0.0 * cs[i]), a)
            top = (top[0] + s[0] * b[0] - s[1] * b[1],
                   top[1] + s[0] * b[1] + s[1] * b[0])
            bot = _cmul((cs[i], 0.0 * cs[i]), b)
            bot = (bot[0] - s[0] * a[0] - s[1] * a[1],
                   bot[1] - s[0] * a[1] + s[1] * a[0])
            hre = hre.at[i].set(top[0]).at[i + 1].set(bot[0])
            him = him.at[i].set(top[1]).at[i + 1].set(bot[1])
            return hre, him

        hre = jnp.concatenate([hre, jnp.zeros((1,), f64)]).at[j + 1].set(hlast)
        him = jnp.concatenate([him, jnp.zeros((1,), f64)])
        hre, him = jax.lax.fori_loop(0, k_max, rot, (hre, him))

        # new rotation [[c, s], [-conj(s), c]] (c real) annihilating slot
        # j+1: c = |a|/rho, s = (a/|a|) conj(b)/rho with
        # rho = sqrt(|a|^2+|b|^2); degenerate a -> c=0, s = phase of
        # conj(b) (both zero -> identity)
        a = (hre[j], him[j])
        b = (hre[j + 1], him[j + 1])
        amag = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
        bmag = jnp.sqrt(b[0] * b[0] + b[1] * b[1])
        rho = jnp.sqrt(amag * amag + bmag * bmag)
        a_ok = amag > tiny
        b_ok = bmag > tiny
        c = jnp.where(a_ok, amag / jnp.maximum(rho, tiny),
                      jnp.where(b_ok, 0.0, 1.0))
        phase = (jnp.where(a_ok, a[0] / jnp.maximum(amag, tiny), 1.0),
                 jnp.where(a_ok, a[1] / jnp.maximum(amag, tiny), 0.0))
        denom = jnp.where(a_ok, jnp.maximum(rho, tiny),
                          jnp.maximum(bmag, tiny))
        s = _cmul(phase, (b[0] / denom, -b[1] / denom))
        s = (jnp.where(b_ok, s[0], 0.0), jnp.where(b_ok, s[1], 0.0))
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(jnp.stack([s[0], s[1]]))

        top = _cmul((c, 0.0 * c), a)
        top = (top[0] + s[0] * b[0] - s[1] * b[1],
               top[1] + s[0] * b[1] + s[1] * b[0])
        hre = hre.at[j].set(top[0])
        him = him.at[j].set(top[1])
        R = R.at[:, j, 0].set(hre[:k_max])
        R = R.at[:, j, 1].set(him[:k_max])

        gj = (g[j, 0], g[j, 1])
        g_new_top = _cmul((c, 0.0 * c), gj)
        g_new_bot = (-(s[0] * gj[0] + s[1] * gj[1]),
                     -(s[0] * gj[1] - s[1] * gj[0]))
        g = g.at[j, 0].set(g_new_top[0]).at[j, 1].set(g_new_top[1])
        g = g.at[j + 1, 0].set(g_new_bot[0]).at[j + 1, 1].set(g_new_bot[1])
        rn2 = g_new_bot[0] ** 2 + g_new_bot[1] ** 2
        # the initial residual is dominated by stiffness-lift components the
        # preconditioner resolves in ONE step; the residual left after that
        # step is the solution-relevant scale, so the convergence target is
        # re-anchored there (with a floor so a spectacular first step cannot
        # set an unreachable target).  Callers whose rhs IS already a
        # residual (the GMRES-IR inner solver) disable this.
        if anchor:
            anc = jnp.maximum(jnp.sqrt(rn2), 1e-13 * beta0)
            tol2 = jnp.where(j == 0,
                             jnp.maximum((tol_rel * anc) ** 2, tol_abs2),
                             tol2)
        if _DEBUG_TRACE:
            jax.debug.print("gmres j={j} rn={r}", j=j, r=jnp.sqrt(rn2))
        return V, Z, R, g, cs, sn, j + 1, rn2, tol2

    def cond(state):
        *_, j, rn2, tol2 = state
        # the estimate cannot certify progress below the basis-precision
        # floor — stop there and let the f64 outer restart take over
        return jnp.logical_and(j < k_max,
                               rn2 > jnp.maximum(tol2, floor2))

    state = (V, Z, R, g, cs, sn, jnp.int32(0), beta0 * beta0, tol2_in)
    V, Z, R, g, cs, sn, j_fin, rn2_est, tol2 = jax.lax.while_loop(
        cond, body, state)

    # inactive rows: R stayed identity, but g[j_fin] holds the residual —
    # mask it out so the back-substitution returns y = 0 there
    active = (jnp.arange(k_max) < j_fin)[:, None]
    g = jnp.where(active, g[:k_max], 0.0)

    def backsub(t, y):
        l = k_max - 1 - t
        acc_re = jnp.einsum("p,p->", R[l, :, 0], y[:, 0]) \
            - jnp.einsum("p,p->", R[l, :, 1], y[:, 1])
        acc_im = jnp.einsum("p,p->", R[l, :, 0], y[:, 1]) \
            + jnp.einsum("p,p->", R[l, :, 1], y[:, 0])
        num = (g[l, 0] - acc_re, g[l, 1] - acc_im)
        den = R[l, l, 0] ** 2 + R[l, l, 1] ** 2
        yl = _cmul(num, (R[l, l, 0] / jnp.maximum(den, tiny),
                         -R[l, l, 1] / jnp.maximum(den, tiny)))
        return y.at[l, 0].set(yl[0]).at[l, 1].set(yl[1])

    y = jax.lax.fori_loop(0, k_max, backsub, jnp.zeros((k_max, 2), f64))

    yb = y.astype(bd)
    xc0 = jnp.einsum("k,kn->n", yb[:, 0], Z[:, 0]) \
        - jnp.einsum("k,kn->n", yb[:, 1], Z[:, 1])
    xc1 = jnp.einsum("k,kn->n", yb[:, 0], Z[:, 1]) \
        + jnp.einsum("k,kn->n", yb[:, 1], Z[:, 0])
    x = x_in + jnp.stack([xc0, xc1]).astype(f64)
    if _DEBUG_TRACE:
        jax.debug.print(
            "gmres cycle j={j} est_rn={e}",
            j=j_fin, e=jnp.sqrt(rn2_est))
    if need_true:
        r_new = bb - A_apply(x)
        rn2 = jnp.sum(r_new * r_new)
        return x, r_new, rn2, tol2
    return x, r0, rn2_est, tol2


# ---------------------------------------------------------------------------
# the mixed sweep
# ---------------------------------------------------------------------------

def _fused_apply_flat(stacked_data, uu, rows, cols, n: int,
                      seg: int | None = None):
    """(S, nnz) operator stack applied to (..., n): output (S, ..., n).

    Module-level counterpart of ``mixed_sweep``'s ``_fused_mv_t``: the nnz
    axis is walked in UNROLLED segments (a ``lax.scan`` over traced operator
    data breaks custom-AD linearization — see the _fused_mv_t note), each
    segment's (S, ..., seg) contribution tensor kept short-lived by the
    serial ``out`` chain.  Exact for padded entries (zero data scatters
    zeros to row 0)."""
    if seg is None:
        seg = _RES_SEG
    S, nnz = stacked_data.shape
    bshape = (1,) * (uu.ndim - 1)  # broadcast shape over uu's batch dims
    if nnz <= 2 * seg:
        contrib = stacked_data.reshape((S,) + bshape + (nnz,)) \
            * uu[..., cols][None]
        out = jnp.zeros((S,) + uu.shape[:-1] + (n,), contrib.dtype)
        return out.at[..., rows].add(contrib)
    k = -(-nnz // seg)
    pad = k * seg - nnz
    dp = jnp.pad(stacked_data, ((0, 0), (0, pad))).reshape(S, k, seg)
    # rows/cols stay traced: index arrays lowered as constants are fatal
    # to the TPU AOT compiler (see Problem.getFRCore)
    rp = jnp.pad(rows, (0, pad)).reshape(k, seg)
    cp = jnp.pad(cols, (0, pad)).reshape(k, seg)
    out = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked_data.dtype)
    for i in range(k):
        contrib = dp[:, i].reshape((S,) + bshape + (seg,)) \
            * uu[..., cp[i]][None]
        out = out.at[..., rp[i]].add(contrib)
    return out


def mixed_apply(K_re, K_im, M_flat, omegas, U_re, U_im, rows, cols, n: int,
                ki_proportional: bool = False, seg: int | None = None):
    """Batched split-complex operator application A(theta) @ U: (F, n) pairs.

    EXACTLY the AD-defining matvec of ``mixed_sweep`` (its ``mv`` closure —
    including the traced ``beta`` projection under ``ki_proportional``),
    batched over the frequency axis and exposed standalone.  The
    adjoint-Jacobian path (models/problem.ResidualFunction, jac_mode
    'adjoint') differentiates theta -> A(theta) U - b(theta) at FIXED U
    with ``jacfwd``: p tangents cost p fused scatter passes and ZERO extra
    solves, which is what makes the Gauss-Newton Jacobian 2 solves per
    frequency instead of (1 + n_params).

    Returns (AU_re, AU_im), each (F, n) f64.
    """
    om2 = (omegas.astype(jnp.float64) ** 2)[:, None]
    Kr = K_re.astype(jnp.float64)
    Ms = M_flat.astype(jnp.float64)
    uu = jnp.stack([U_re.astype(jnp.float64), U_im.astype(jnp.float64)])
    if ki_proportional:
        Ki = K_im.astype(jnp.float64)
        beta = jnp.vdot(Kr, Ki) / jnp.vdot(Kr, Kr)
        Kx, Mx = _fused_apply_flat(jnp.stack([Kr, Ms]), uu, rows, cols, n, seg)
        return (Kx[0] - beta * Kx[1] - om2 * Mx[0],
                Kx[1] + beta * Kx[0] - om2 * Mx[1])
    Ki = K_im.astype(jnp.float64)
    Kx, Mx, Kix = _fused_apply_flat(
        jnp.stack([Kr, Ms, Ki]), uu, rows, cols, n, seg)
    return (Kx[0] - Kix[1] - om2 * Mx[0],
            Kx[1] + Kix[0] - om2 * Mx[1])


def mixed_sweep(K_re, K_im, M_flat, B_re, B_im, omegas, rows, cols, n: int,
                W64, invK32, n_refine: int = 16, refine_tol: float = 3e-7,
                mg=None, K_ref64=None, freq_chunk: int | None = None,
                ki_proportional: bool = False, K_ref32=None,
                k_cycle: int | None = None, basis_f32: bool | None = None,
                band=None, band_correct_n: int | None = None,
                diagnostics: bool = False, adjoint: bool = False):
    """f64-grade frequency sweep on f32 hardware — split-complex interface.

    All operator/rhs data arrives as f64 (complex quantities as re/im pairs —
    complex128 is not a TPU type, f64 pairs are): K_re/K_im (nnz,),
    M_flat (nnz,), B_re/B_im (F, n), omegas (F,).
    W64: (n, m) f64 M-orthonormal band basis (static);
    invK32: (n, n) f32 static preconditioner.

    Per-frequency solve: exact band resolvent start + FGMRES in
    split-complex f64 with the f32 complement preconditioner.  Precision
    placement is the load-bearing design decision, learned the hard way:

    * Krylov iterates, residuals and operator applications must be f64.
      An all-f32 inner solver has a residual floor of
      eps32 * kappa_effective * ||r|| (representing the huge smooth-mode
      corrections in f32 injects noise that K amplifies back into the
      residual) — at 20k+ DOF that floor is O(1) and the iteration cannot
      converge AT ALL.
    * The f64 operator application is exact either way it is laid out:
      the flat scatter SpMV (elementwise f64, O(nnz) memory, cost
      serialized over nnz and therefore BATCH-INVARIANT — measured 206 ms
      at nnz=2e6 whether 16 or 128 frequency lanes ride along), or, when
      ``band`` supplies the RCM block-tridiagonal layout, the emulated-f64
      block GEMM of ops/band.py — measured 3.8x the scatter at n=21k
      (54 -> 14 ms per fused apply) at the price of materializing the
      (nb, b, 3b) f64 block tensors (~n * 24 * bandwidth bytes each).
    * Only the PRECONDITIONER is f32 (dense refined inverse below ~8k DOF,
      the scatter-free band two-grid cycle above — ops/mg.py), where
      roundoff costs iterations, never accuracy.

    Complement preconditioner selection: the dense f32 inverse ``invK32``
    by default (with ``K_ref32`` enabling its f32 refinement rounds); pass
    ``mg`` (two-grid band data or multilevel arrays — see
    Problem._mixed_core) plus ``K_ref64`` for the O(nnz) paths.

    Returns (U_re, U_im) f64 — validated at ~3e-8 relative against f64
    sparse LU including exactly at resonances (tests/test_mixed.py).
    """
    # beta is only the *preconditioner's* model of K_im (band resolvent
    # denominators); the refinement residual uses the true K_im, so the
    # converged solution is exact for arbitrary complex stiffness.
    beta = jnp.vdot(K_re, K_im) / jnp.vdot(K_re, K_re)

    Ms64 = jax.lax.stop_gradient(M_flat).astype(jnp.float64)
    beta64 = jax.lax.stop_gradient(beta).astype(jnp.float64)

    # ---- operator applications (flat scatter SpMV, exact f64) -----------
    # The K and M applications the solver needs together are FUSED into
    # one scatter pass: the scatter's cost is the serialized walk over the
    # nnz entries, so stacking operators (and re/im) into the batch axes
    # nearly halves the dominant per-iteration cost.
    Kr64 = jax.lax.stop_gradient(K_re).astype(jnp.float64)

    def K_mv(x):
        return _spmv64(Kr64, rows, cols, x, n)

    def M_mv(x):
        return _spmv64(Ms64, rows, cols, x, n)

    def _fused_mv(stacked_data, uu, seg: int | None = None):
        """(S, nnz) operator stack applied to (..., n): output (S, ..., n).

        The nnz axis is scanned in segments: the scatter's cost is the
        serialized walk over entries (unchanged), but the (S, batch, nnz)
        contribution tensor — which at large frequency chunks dominated
        the program's HBM footprint — never materializes beyond one
        segment.  Padding rows with 0 and data with 0.0 adds zeros to row
        0: harmless."""
        if seg is None:
            seg = _RES_SEG
        S, nnz = stacked_data.shape
        if nnz <= 2 * seg:
            contrib = stacked_data[:, None, :] * uu[..., cols][None]
            out = jnp.zeros((S,) + uu.shape[:-1] + (n,), contrib.dtype)
            return out.at[..., rows].add(contrib)
        k = -(-nnz // seg)
        pad = k * seg - nnz
        dp = jnp.pad(stacked_data, ((0, 0), (0, pad))) \
            .reshape(S, k, seg).transpose(1, 0, 2)
        rp = jnp.pad(rows, (0, pad)).reshape(k, seg)
        cp = jnp.pad(cols, (0, pad)).reshape(k, seg)

        def step(out, args):
            d, r, c = args
            contrib = d[:, None, :] * uu[..., c][None]
            return out.at[..., r].add(contrib), None

        out0 = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked_data.dtype)
        out, _ = jax.lax.scan(step, out0, (dp, rp, cp))
        return out

    def _fused_mv_t(stacked_data, uu, seg: int | None = None):
        """Traced counterpart of ``_fused_mv`` for the AD-defining matvec.

        Same segmented fused apply, but with an UNROLLED Python loop
        instead of ``lax.scan``: custom_linear_solve's AD machinery
        partial-evaluates the matvec with the operator data as a traced
        closure variable, and a scan over that data breaks its
        linearization (jax ValAccum leak — measured, .probes; plain
        unrolled scatter-adds linearize and transpose exactly, verified
        equal to the unsegmented apply).  The serial ``out`` dependency
        chain keeps each segment's (S, lanes*tangents, seg) contribution
        tensor short-lived, which is what bounds the r+J HBM footprint at
        the 46k-100k tiers."""
        if seg is None:
            seg = _RES_SEG
        S, nnz = stacked_data.shape
        if nnz <= 2 * seg:
            contrib = stacked_data[:, None, :] * uu[..., cols][None]
            out = jnp.zeros((S,) + uu.shape[:-1] + (n,), contrib.dtype)
            return out.at[..., rows].add(contrib)
        k = -(-nnz // seg)
        pad = k * seg - nnz
        dp = jnp.pad(stacked_data, ((0, 0), (0, pad))).reshape(S, k, seg)
        rp = jnp.pad(rows, (0, pad)).reshape(k, seg)
        cp = jnp.pad(cols, (0, pad)).reshape(k, seg)
        out = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked_data.dtype)
        for i in range(k):
            contrib = dp[:, i][:, None, :] * uu[..., cp[i]][None]
            out = out.at[..., rp[i]].add(contrib)
        return out

    KM64 = jnp.stack([Kr64, Ms64])
    # TRACED operator stack for the AD-defining matvec (custom_linear_solve
    # ``mv``): ALWAYS the segmented flat scatter, even when the hot loop
    # runs the band GEMM layout.  ``mv`` only feeds the AD rules (tangent
    # right-hand sides, transpose), so its cost is one fused pass per
    # tangent — while routing it through the band layout would give every
    # jacfwd tangent its own (nb, b, 3b) band tensor AND broadcast it over
    # the frequency lanes (measured 4.8 GB at n=46k x 8 lanes x 3 params:
    # the r+J OOM at the scale tiers).
    KMt64 = jnp.stack([K_re.astype(jnp.float64), M_flat.astype(jnp.float64)])

    def KM_mv(uu):
        return _fused_mv(KM64, uu)

    if not ki_proportional:
        Ki64 = jax.lax.stop_gradient(K_im).astype(jnp.float64)
        KMI64 = jnp.stack([Kr64, Ms64, Ki64])
        KMIt64 = jnp.stack([K_re.astype(jnp.float64),
                            M_flat.astype(jnp.float64),
                            K_im.astype(jnp.float64)])

        def Ki_mv(x):
            return _spmv64(Ki64, rows, cols, x, n)

        def KMI_mv(uu):
            return _fused_mv(KMI64, uu)

    if band is not None:
        # ---- block-tridiagonal exact f64 operator (ops/band.py) ---------
        # One theta-dependent scatter per sweep builds the f64 block
        # tensors (flat_to_band is linear — tangents flow exactly), then
        # every hot-loop operator application is an emulated-f64 block
        # GEMM: 3.8x the scatter at n=21k, near batch-invariant.  The
        # K/M/Ki matrices are symmetric, so the same tensors serve the
        # forward and (conjugate-)transpose applications.
        from .band import band_mv as _band_mv, flat_to_band as _f2b

        _lay = band["layout"]
        _lin = band["lin"]

        def _to_band(v):
            return _f2b(v.astype(jnp.float64), _lay, _lin)

        # NOTE: no traced band copies — the AD-defining matvec (``mv``)
        # stays on the segmented flat scatter in every layout (see the
        # KMt64 build note above): band tensors for jacfwd tangents cost
        # (n_params, nb, b, 3b) HBM each and broadcast over lanes.
        if band.get("ozaki"):
            # exact-integer limb apply (ops/ozaki.py): one radix-64 int8
            # decomposition per sweep call serves every operator
            # application as MXU integer GEMMs — no emulated-f64 product
            # tensor, 6.8x the apply throughput on chip and numpy-f64-
            # grade accuracy (the cancellations happen in exact ints)
            from .ozaki import build_ozaki_band, ozaki_mv as _oz_mv

            import os as _os

            _oz_limbs = int(_os.environ.get("PIP_OZAKI_LIMBS", "0")) or None
            _ops64 = [Kr64, Ms64] if ki_proportional else [Kr64, Ms64, Ki64]
            _oz = build_ozaki_band(
                jnp.stack([_to_band(v) for v in _ops64]), _lay,
                **({"n_limbs": _oz_limbs} if _oz_limbs else {}))

            def K_mv(x):
                return _oz_mv(_oz, x, 0, 1)[0]

            def M_mv(x):
                return _oz_mv(_oz, x, 1, 2)[0]

            def KM_mv(uu):
                return _oz_mv(_oz, uu, 0, 2)

            if not ki_proportional:
                def Ki_mv(x):
                    return _oz_mv(_oz, x, 2, 3)[0]

                def KMI_mv(uu):
                    return _oz_mv(_oz, uu)
        else:
            Kband = _to_band(Kr64)
            Mband = _to_band(Ms64)

            def K_mv(x):
                return _band_mv(Kband, x, _lay)

            def M_mv(x):
                return _band_mv(Mband, x, _lay)

            def KM_mv(uu):
                return jnp.stack([_band_mv(Kband, uu, _lay),
                                  _band_mv(Mband, uu, _lay)])

            if not ki_proportional:
                Kiband = _to_band(Ki64)

                def Ki_mv(x):
                    return _band_mv(Kiband, x, _lay)

                def KMI_mv(uu):
                    return jnp.stack([_band_mv(Kband, uu, _lay),
                                      _band_mv(Mband, uu, _lay),
                                      _band_mv(Kiband, uu, _lay)])

    # ---- per-theta band Rayleigh-Ritz, all f64 --------------------------
    # Kw = W^T K_r W (m x m), Mw = W^T M W; W is M(theta-independent)-
    # orthonormal against the *static* M, which is exact here since M does
    # not depend on theta.
    KW = K_mv(W64.T)                                   # (m, n) rows = K w_i
    MW = M_mv(W64.T)
    Kw = KW @ W64                                      # (m, m) f64 matmul
    Mw = MW @ W64
    Kw = 0.5 * (Kw + Kw.T)
    Mw = 0.5 * (Mw + Mw.T)
    # W is M-orthonormal in f64 (host) and M is theta-independent, so
    # Mw == I to roundoff; first-order congruence correction keeps the
    # band pencil consistent without needing an f64 factorization:
    # C = K - (K (Mw - I) + (Mw - I) K)/2
    E = Mw - jnp.eye(Mw.shape[0], dtype=Mw.dtype)
    Cw = Kw - 0.5 * (Kw @ E + E @ Kw)
    Cw_sym = 0.5 * (Cw + Cw.T)
    lam_w, Qw = jnp.linalg.eigh(Cw_sym)               # small m x m, f64
    # Rayleigh-quotient refinement of the Ritz values: XLA:TPU's f64 eigh
    # carries eigenVALUE errors up to ~1e-7 relative (measured 2.4e-4 max
    # on a 1e6-spread synthetic; LAPACK is ~1e-15).  The resonance
    # denominators lam - om^2 amplify that error by the modal Q (~1/beta
    # ~ 300x) into the band resolvent, flooring the FRF at ~6e-5 at scanned
    # peaks (measured at n=32420) NO MATTER the Krylov budget — the final
    # band corrections re-inject the mis-located resonance each pass.  One
    # Rayleigh quotient through the exact f64 matmul (materialized
    # multiply+reduce, 2.6e-15) is quadratically accurate in the vector
    # residual and restores ~1e-11 eigenvalues for one (m, m) GEMM.
    CQ = Cw_sym @ Qw
    lam_w = jnp.einsum("im,im->m", Qw, CQ) / jnp.einsum("im,im->m", Qw, Qw)
    Zw64 = W64 @ Qw                                    # (n, m) band modes, f64

    MZ64 = M_mv(Zw64.T).T                              # (n, m) M-weighted

    # projected operator panels: A (x0 = Zw y) evaluates through these m-wide
    # f64 matmuls instead of a full scatter pass — the initial residual of
    # every lane costs O(n m) instead of O(nnz * batch)
    KZw64 = KW.T @ Qw                                  # (n, m) = K Zw
    if not ki_proportional:
        KiZw64 = Ki_mv(Zw64.T).T                       # (n, m) = K_im Zw

    # Exact Galerkin projections for the resolvent START and the FINAL
    # band corrections.  The TPU eigh's O(1e-7) ROTATION error makes the
    # diagonal resolvent model of the projected pencil wrong by ~e within
    # span(Z); a resonance amplifies that by the modal Q (~1/beta ~ 300x)
    # straight into the solution, flooring band-tier FRF accuracy at
    # ~e/beta ~ 2e-5 (measured at n=20916/32420; the CPU backend's LAPACK
    # eigh has e ~ 1e-15 and shows no such floor).  The exactly-projected
    # m x m pencil is computable with exact-f64 GEMMs, so the accuracy-
    # critical band solves below refine the diagonal model against it:
    # each pass contracts the m-solve error by ~e/beta, putting the
    # start + 2 passes at ~(e/beta)^3 — below the f64 noise floor.  The
    # Krylov PREconditioner keeps the cheap diagonal model (it only
    # steers the subspace).
    Kp64 = Zw64.T @ KZw64                              # (m, m) = Z^T K Z
    Mp64 = Zw64.T @ MZ64                               # (m, m) ~ I
    Kp64 = 0.5 * (Kp64 + Kp64.T)
    Mp64 = 0.5 * (Mp64 + Mp64.T)
    if not ki_proportional:
        Kip64 = Zw64.T @ KiZw64                        # (m, m) = Z^T K_im Z
        Kip64 = 0.5 * (Kip64 + Kip64.T)

    # ---- FGMRES shape knobs (tier-tuned) --------------------------------
    # n_refine is the TOTAL Krylov budget; it is spent as restarted cycles
    # of k_cycle iterations.  Small cycles keep the (B, k, 2, n) basis
    # tensors (the dominant memory traffic) small and the compiled graph
    # short; the f64 outer restarts supply unlimited depth.
    if basis_f32 is None:
        # f32 basis storage is safe where eps32 * kappa(equilibrated K)
        # stays well below 1 (the dense-preconditioner tier); the band/MG
        # tiers keep the f64 basis (measured: f32 inner representations
        # stall at 20k+ DOF)
        basis_f32 = mg is None
    if k_cycle is None:
        # 8-iteration cycles at every tier.  Chip A/B (.probes/kcycle_ab,
        # r5): shorter default cycles LOSE — the outer while_loop exits on
        # the batch's SLOWEST lane, and a 512-frequency sweep always has a
        # resonance lane spending the whole budget, so k_cycle=4 at
        # n_refine=16 just doubles the restart count (true residual + f64
        # re-anchor each) for the same iterations: 1785 solves/s vs 3554
        # at k_cycle=8 on the bench tier.  The adaptive lever that DOES
        # work is the total budget: n_refine=8/k_cycle=4 matches the
        # n_refine=16 accuracy floor at +2.4% (see ROADMAP "performance
        # headroom" — re-measured r5, the round-2 "+20%" predates the
        # early-exit restart loop).
        k_cycle = 8
    k_cycle = max(1, min(int(k_cycle), int(n_refine)))
    n_cycles = -(-int(n_refine) // k_cycle)
    if basis_f32:
        # a single f32-basis cycle floors at ~3e-7 relative; targets beyond
        # that need at least one f64 outer restart.  Spare cycles are free
        # at runtime (the outer while_loop exits on the TRUE residual), so
        # always allow the restart rather than silently capping accuracy.
        n_cycles = max(n_cycles, 2)

    if band_correct_n is None:
        # Band-tier Ritz pairs (m modes from a 21k+ space) carry larger
        # subspace angles than the dense tier's, so the single-pass final
        # band correction leaves ~1e-5 FRF error standing there; each
        # true-residual pass contracts it ~100x for one extra operator
        # application per solve.  The dense tier is already at ~5e-8 with
        # one pass — don't pay the apply.  CPU-oracle worst rel err at the
        # scanned resonance peak with two passes: 1.0e-7 @ n=21k,
        # 4.7e-7 @ 46k, 2.8e-7 @ 82k, ~1.4e-6 @ 104k — the 104k residue is
        # NOT band defect (a 3rd pass and a doubled Krylov budget both
        # leave it unchanged): it is the f64 noise floor of resonance-
        # amplified 100k-DOF solves, which the splu oracle itself carries
        # (see SCALE.md's floor measurement).
        band_correct_n = 2 if mg is not None else 1

    if basis_f32:
        Zw32 = Zw64.astype(jnp.float32)
        MZ32 = MZ64.astype(jnp.float32)

    if mg is not None and "tg_band0" in mg:
        # band tier: scatter/gather-free symmetric two-grid cycle
        from .band import band_mv_f32
        from .mg import twogrid_apply

        tg_band0 = mg["tg_band0"]
        tg_layout = mg["layout"]
        tg_rl = mg["rl"]
        tg_lmax = mg["lmax"]

        def cycle(x32):
            return twogrid_apply(tg_band0, mg["dinv"], tg_lmax,
                                 mg["Pt"], mg["Kc_inv"], x32,
                                 tg_layout, tg_rl, mg["slots"])

        def Kref32_mv(x32):
            return band_mv_f32(tg_band0, x32, tg_layout)

        def precond32(x32):
            # f32 refinement rounds around the cycle: each round squares
            # the cycle's error for one extra f32 matvec + cycle
            y32 = cycle(x32)
            for _ in range(_MG_REFINE):
                r32 = x32 - Kref32_mv(y32)
                y32 = y32 + cycle(r32)
            return y32
    elif mg is not None:
        from .mg import multilevel_apply

        def cycle(x32):
            return multilevel_apply(mg["arrays"], mg["static"], K_ref64,
                                    rows, cols, x32)

        def Kref32_mv(x32):
            return spmv_flat(K_ref64.astype(jnp.float32), rows, cols,
                             x32, n)

        def precond32(x32):
            y32 = cycle(x32)
            for _ in range(_MG_REFINE):
                r32 = x32 - Kref32_mv(y32)
                y32 = y32 + cycle(r32)
            return y32
    else:
        def apply_inv(x32):
            # HIGHEST precision is a measured choice: bf16 multiplies
            # degrade the preconditioner just enough to cost extra GMRES
            # iterations, and with vmapped frequency lanes every lane pays
            # the worst lane's count — the 6-pass f32 GEMM is cheaper than
            # the iterations it saves (A/B: 7.1 s vs 13.8 s per 512-pt
            # sweep at n=5428)
            return jnp.einsum("ij,...j->...i", invK32, x32)

        def precond32(x32):
            # batched (..., n) application of the dense f32 inverse, with
            # f32 iterative-refinement rounds when the reference stiffness
            # is supplied: the f32 inverse carries error
            # ~eps32*kappa(K~) ~ 0.2-0.3 on the equilibrated operator
            # (kappa ~ 1e6), capping GMRES at ~0.6 digits/iteration; each
            # round squares that error for one extra GEMM + one f32
            # SpMV — measured ~2x fewer iterations
            y32 = apply_inv(x32)
            if K_ref32 is not None:
                for _ in range(_PRECOND_REFINE):
                    r32 = x32 - spmv_flat(K_ref32, rows, cols, y32, n)
                    y32 = y32 + apply_inv(r32)
            return y32

    def precond(x64):
        return precond32(x64.astype(jnp.float32)).astype(jnp.float64)

    def one(om, b_re_in, b_im_in):
        om64 = om.astype(jnp.float64)
        om2 = om64 * om64

        def make_solver(sign, diag: bool = False):
            """Solver for A (sign=+1) or conj(A) (sign=-1).

            ``diag``: also return the solve's convergence signal
            (final true residual norm, initial residual norm, target) —
            used by the diagnostics path, which bypasses
            custom_linear_solve (no AD through diagnostics).

            In the split-complex real representation, the transpose of
            'multiply by symmetric complex A' is 'multiply by conj(A)'
            ([[Ar,-Ai],[Ai,Ar]]^T = [[Ar,Ai],[-Ai,Ar]]), so the
            transpose_solve of custom_linear_solve must flip the imaginary
            sign — this is what makes reverse-mode gradients exact.
            """
            sb = sign * beta64

            dre_d = lam_w - om2
            dim_d = sb * lam_w
            den_d = dre_d * dre_d + dim_d * dim_d

            def _rsolve_diag(q_re, q_im):
                """Diagonal-resolvent model of the projected pencil."""
                y_re = (q_re * dre_d + q_im * dim_d) / den_d
                y_im = (q_im * dre_d - q_re * dim_d) / den_d
                return y_re, y_im

            def _proj_apply(y_re, y_im):
                """Exact projected operator Z^T A Z on (m,) coeffs."""
                Ky_re = Kp64 @ y_re
                Ky_im = Kp64 @ y_im
                My_re = Mp64 @ y_re
                My_im = Mp64 @ y_im
                if ki_proportional:
                    return (Ky_re - sb * Ky_im - om2 * My_re,
                            Ky_im + sb * Ky_re - om2 * My_im)
                Kiy_re = Kip64 @ y_re
                Kiy_im = Kip64 @ y_im
                return (Ky_re - sign * Kiy_im - om2 * My_re,
                        Ky_im + sign * Kiy_re - om2 * My_im)

            def band_coeffs_f64(r_re, r_im):
                """Exact Galerkin solve of the projected system: diagonal
                resolvent start + 2 refinement passes against the exact
                m x m pencil (see the Kp64 build note above)."""
                q_re = Zw64.T @ r_re
                q_im = Zw64.T @ r_im
                y_re, y_im = _rsolve_diag(q_re, q_im)
                for _ in range(2):
                    Ay_re, Ay_im = _proj_apply(y_re, y_im)
                    d_re, d_im = _rsolve_diag(q_re - Ay_re, q_im - Ay_im)
                    y_re = y_re + d_re
                    y_im = y_im + d_im
                return y_re, y_im

            def band_solve_f64(r_re, r_im):
                y_re, y_im = band_coeffs_f64(r_re, r_im)
                return Zw64 @ y_re, Zw64 @ y_im

            def band_start(bbs):
                """Band-resolvent start x0 AND its exact A x0, both through
                the projected (n, m) panels — no scatter pass for the
                initial residual."""
                y_re, y_im = band_coeffs_f64(bbs[0], bbs[1])
                x0 = jnp.stack([Zw64 @ y_re, Zw64 @ y_im])
                KZy = jnp.stack([KZw64 @ y_re, KZw64 @ y_im])
                MZy = jnp.stack([MZ64 @ y_re, MZ64 @ y_im])
                if ki_proportional:
                    Ax0 = jnp.stack(
                        [KZy[0] - sb * KZy[1] - om2 * MZy[0],
                         KZy[1] + sb * KZy[0] - om2 * MZy[1]])
                else:
                    KiZy = jnp.stack([KiZw64 @ y_re, KiZw64 @ y_im])
                    Ax0 = jnp.stack(
                        [KZy[0] - sign * KiZy[1] - om2 * MZy[0],
                         KZy[1] + sign * KiZy[0] - om2 * MZy[1]])
                return x0, Ax0

            def A_apply(uu):
                """Exact f64 operator on a (2, n) re/im stack, one fused
                scatter pass for all the needed matvecs."""
                if ki_proportional:
                    Ku, Mu = KM_mv(uu)
                    return jnp.stack([Ku[0] - sb * Ku[1] - om2 * Mu[0],
                                      Ku[1] + sb * Ku[0] - om2 * Mu[1]])
                Ku, Mu, Kiu = KMI_mv(uu)
                return jnp.stack([Ku[0] - sign * Kiu[1] - om2 * Mu[0],
                                  Ku[1] + sign * Kiu[0] - om2 * Mu[1]])

            def A_res_apply(uu):
                """Residual-grade exact apply: combine the flat operator
                values ENTRYWISE per frequency, then one scatter pass.

                The fused speed-grade route above computes K u and
                om^2 M u as separate full sums and subtracts them LAST; at
                a resonance those sums cancel (K u ~ om^2 M u), so each
                sum's own rounding eps64 * Sum_k |K_jk u_k| survives the
                subtraction.  Measured at n=20916 against an 80-bit host
                oracle: 1.1e-11*||b|| residual noise for combine-last vs
                8e-13 for this entrywise-combined order (A_jk =
                K_jk - om^2 M_jk cancels at the ENTRY level, where both
                operands are exact).  That noise is resonance-aligned
                (it rides the huge resonant component of u) and the
                resolvent re-amplifies it by kappa_modal ~ 1e6 — it WAS
                the 2e-5 band-tier TPU FRF floor that no Krylov budget
                could cross.  Used only for the true residuals feeding
                the final band corrections: one gather-combine-scatter
                per pass.

                The nnz axis is scanned in segments exactly like
                ``_fused_mv``: ``are`` depends on the per-lane ``om2``, so
                under a vmapped frequency chunk it is a (lanes, nnz)
                tensor — at nnz=2e6 x 32 lanes that is several GB of HBM
                temps after TPU tile padding (measured: the 82k-DOF sweep
                and the 46k-DOF Jacobian both exceeded the 16 GB chip on
                exactly these allocations).  The combine is entrywise, so
                segmentation is exact; padded entries carry zero data and
                scatter zeros to row 0."""
                seg = _RES_SEG
                nnz = rows.shape[0]
                if nnz <= 2 * seg:
                    are = Kr64 - om2 * Ms64
                    aim = sb * Kr64 if ki_proportional else sign * Ki64
                    g_re = uu[0][cols]
                    g_im = uu[1][cols]
                    contrib = jnp.stack([are * g_re - aim * g_im,
                                         aim * g_re + are * g_im])
                    out = jnp.zeros((2, uu.shape[-1]), dtype=uu.dtype)
                    return out.at[:, rows].add(contrib)
                k = -(-nnz // seg)
                pad = k * seg - nnz

                def _segs(v):
                    return jnp.pad(v, (0, pad)).reshape(k, seg)

                xs = (_segs(Kr64), _segs(Ms64),
                      _segs(Kr64) if ki_proportional else _segs(Ki64),
                      _segs(rows), _segs(cols))

                def step(out, args):
                    kd, md, id_, r, c = args
                    are = kd - om2 * md
                    aim = sb * id_ if ki_proportional else sign * id_
                    g_re = uu[0][c]
                    g_im = uu[1][c]
                    contrib = jnp.stack([are * g_re - aim * g_im,
                                         aim * g_re + are * g_im])
                    return out.at[:, r].add(contrib), None

                out0 = jnp.zeros((2, uu.shape[-1]), dtype=uu.dtype)
                out, _ = jax.lax.scan(step, out0, xs)
                return out

            import os as _os
            if (band is not None and band.get("ozaki")
                    and _os.environ.get("PIP_OZAKI_RES", "1") != "0"):
                # exact-integer limb apply: K u and om^2 M u are each
                # exact to the limb cutoff (the row-sum cancellations
                # happen in int32, not f64), so the combine-LAST A_apply
                # is already residual-grade — skip the nnz-segment scan
                # entirely (it is batch-invariant ~0.2 s per pass at
                # nnz=2.6e6 and was 2 passes per solve)
                A_res_apply = A_apply

            def band_stack(rr):
                y_re, y_im = band_solve_f64(rr[0], rr[1])
                return jnp.stack([y_re, y_im])

            def P_common(rr, band_part, Pm, Zm, pc):
                """Band resolvent + deflated complement cycle — the Krylov
                preconditioner.  The complement correction is M-projected
                against the Ritz band so band directions are handled solely
                by the exact resolvent (the preconditioner stays a good
                approximation of A^-1 near resonances)."""
                db = band_part(rr)
                rc = rr - (Pm @ (Zm.T @ rr.T)).T
                dc = pc(rc)
                dc = dc - (dc @ Pm) @ Zm.T
                return db + dc

            def P_apply(rr):
                return P_common(rr, band_stack, MZ64, Zw64, precond)

            if basis_f32:
                # whole preconditioner in f32 — it only steers the Krylov
                # subspace; the f64 resolvent denominators are computed in
                # f64 first (cancellation near lam ~ om^2) then cast, and
                # the loss factor floors |den| at ~beta*lam so the f32
                # quotient is safe
                dre32 = (lam_w - om2).astype(jnp.float32)
                dim32 = (sb * lam_w).astype(jnp.float32)
                den32 = dre32 * dre32 + dim32 * dim32

                def band_stack32(rr):
                    q = Zw32.T @ rr.T                     # (m, 2)
                    y_re = (q[:, 0] * dre32 + q[:, 1] * dim32) / den32
                    y_im = (q[:, 1] * dre32 - q[:, 0] * dim32) / den32
                    return jnp.stack([Zw32 @ y_re, Zw32 @ y_im])

                def P_apply32(rr):
                    return P_common(rr, band_stack32, MZ32, Zw32, precond32)

                P_use = P_apply32
            else:
                P_use = P_apply

            # amplification-aware residual target: forward error ~
            # kappa(A) * relative residual, and near a resonance
            # kappa ~ 1/beta (~300) — tighten by the band-computable
            # amplification so the FRF accuracy holds AT the peaks while
            # off-resonance solves stay cheap.  No absolute floor: ||b||
            # is dominated by a few huge stiffness-lift components whose
            # f64 evaluation noise sits in stiff (A^-1-small) directions,
            # so residuals below eps64*||b|| are still productive; the
            # iteration caps bound any stagnation.
            den = jnp.sqrt((lam_w - om2) ** 2 + (sb * lam_w) ** 2)
            amp = jnp.maximum(jnp.max(lam_w / den), 1.0)
            tol_eff = jnp.maximum(refine_tol / amp, 3e-12)

            def slv(mv_, bb):
                bb_re, bb_im = bb
                bbs = jnp.stack([bb_re, bb_im])
                x0, Ax0 = band_start(bbs)
                out = _pgmres(A_apply, P_use, bbs, x0, tol_eff, 0.0,
                              k_cycle, n_cycles=n_cycles,
                              basis_f32=basis_f32, r0=bbs - Ax0,
                              final_correct=band_stack,
                              final_correct_n=band_correct_n,
                              A_final=A_res_apply, return_info=diag)
                if diag:
                    u, rn, rn_fin, rn0, tol = out
                    return u[0], u[1], rn, rn_fin, rn0, tol
                return (out[0], out[1])

            return slv

        def mv(x):
            """Split-complex A x (f64): x is a (re, im) pair pytree.

            TRACED (the AD-defining matvec of custom_linear_solve): one
            fused segmented scatter pass over the traced operator stack —
            tangents ride the (S, nnz) flat data, never a band tensor.

            With ``ki_proportional`` the imaginary stiffness matvecs are
            scalar multiples of the real ones (K_i = beta K_r); the traced
            projection ``beta`` makes the tangent map exact for the
            scalar-loss material families: dK_i = dbeta K_r + beta dK_r
            and the projection's differential recovers dbeta exactly."""
            x_re, x_im = x
            xx = jnp.stack([x_re, x_im])
            if ki_proportional:
                Kx, Mx = _fused_mv_t(KMt64, xx)
                return (Kx[0] - beta * Kx[1] - om2 * Mx[0],
                        Kx[1] + beta * Kx[0] - om2 * Mx[1])
            Kx, Mx, Kix = _fused_mv_t(KMIt64, xx)
            return (Kx[0] - Kix[1] - om2 * Mx[0],
                    Kx[1] + Kix[0] - om2 * Mx[1])

        if adjoint:
            # adjoint solve A^T y = g (split-complex: conj(A), the same
            # solver the transpose rule uses).  No custom_linear_solve
            # wrapper: the adjoint-Jacobian path (ResidualFunction
            # jac_mode 'adjoint') treats y as a CONSTANT and
            # differentiates an explicit residual map (mixed_apply)
            # instead of this solve.
            return make_solver(-1.0)(None, (b_re_in, b_im_in))
        if diagnostics:
            # diagnostics path: the same solve, plus its convergence
            # signal; no custom_linear_solve wrapper (and no AD) —
            # callers use it to DETECT unconverged solves, not to train
            # through them
            return make_solver(1.0, diag=True)(None, (b_re_in, b_im_in))
        return jax.lax.custom_linear_solve(
            mv, (b_re_in, b_im_in),
            solve=make_solver(1.0), transpose_solve=make_solver(-1.0),
        )

    om64 = omegas.astype(jnp.float64)
    Br64 = B_re.astype(jnp.float64)
    Bi64 = B_im.astype(jnp.float64)
    F = om64.shape[0]

    # TPU floor on the vmapped lane count.  Measured on the axon v5e
    # runtime (2026-08-18, n=32420 band tier): a 4-lane vmap of this solve
    # returns NaN at a resonance lane while the identical 8/32/64-lane
    # calls — and the CPU backend at any lane count — are finite and
    # correct.  The per-lane math is lane-count-independent, so this is a
    # small-batch XLA:TPU codegen path (same family as the (1,)-shaped f64
    # scalar-chain bug in CLAUDE.md, where ops on fewer than ~8 lanes
    # compile through a different sublane tiling).  Padding tiny batches
    # with copies of the last frequency keeps every compiled shape on the
    # known-good >= 8-lane path for one duplicate solve's cost.
    min_lanes = _min_lanes()

    def vmap_padded(om, br, bi):
        b = om.shape[0]
        if b >= min_lanes:
            return jax.vmap(one)(om, br, bi)
        r = min_lanes - b
        om = jnp.concatenate([om, jnp.broadcast_to(om[-1:], (r,))])
        br = jnp.concatenate([br, jnp.broadcast_to(br[-1:], (r,) + br.shape[1:])])
        bi = jnp.concatenate([bi, jnp.broadcast_to(bi[-1:], (r,) + bi.shape[1:])])
        out = jax.vmap(one)(om, br, bi)
        return jax.tree_util.tree_map(lambda a: a[:b], out)

    if freq_chunk is None or freq_chunk >= F:
        return vmap_padded(om64, Br64, Bi64)

    # Chunk the frequency axis through a scan (lax.map batch_size): bounds
    # the dominant per-frequency intermediates — (chunk, nnz) gathers in
    # flat layout, (chunk, nb, 3, b) panels in band layout — and keeps the
    # AOT compile tractable for jacfwd-of-sweep at >12k DOF (measured: the
    # unchunked r+J graph fails to compile at 21k, the chunked one compiles
    # in ~2 min).  lax.map applies ``one`` per frequency and vmaps
    # internally over batch_size-sized chunks (scan across chunks).
    #
    # The chunks are DIFFICULTY-SORTED first: inside a chunk every vmapped
    # lane pays the worst lane's GMRES iteration count, so grouping
    # frequencies by their band-computable resonance amplification lets
    # smooth chunks exit after ~2 iterations while only the near-resonant
    # chunk iterates deep (the in-graph argsort costs two tiny gathers).
    den_f = jnp.sqrt((lam_w[None, :] - (om64 ** 2)[:, None]) ** 2
                     + (beta64 * lam_w[None, :]) ** 2)
    amp_f = jnp.max(lam_w[None, :] / den_f, axis=1)
    order = jnp.argsort(amp_f)
    inv_order = jnp.argsort(order)
    oms, Brs, Bis = om64[order], Br64[order], Bi64[order]
    # pad the sorted axis to a chunk multiple: lax.map runs a remainder
    # chunk as its own smaller vmap, which must also stay on the >= 8-lane
    # TPU path (see vmap_padded above); duplicated tail lanes land in the
    # hardest (most resonant) chunk and are sliced off below
    chunk = max(int(freq_chunk), min_lanes)
    pad = (-F) % chunk
    if pad:
        oms = jnp.concatenate([oms, jnp.broadcast_to(oms[-1:], (pad,))])
        Brs = jnp.concatenate(
            [Brs, jnp.broadcast_to(Brs[-1:], (pad,) + Brs.shape[1:])])
        Bis = jnp.concatenate(
            [Bis, jnp.broadcast_to(Bis[-1:], (pad,) + Bis.shape[1:])])
    out = jax.lax.map(lambda a: one(*a), (oms, Brs, Bis),
                      batch_size=chunk)
    return jax.tree_util.tree_map(lambda a: a[:F][inv_order], out)
