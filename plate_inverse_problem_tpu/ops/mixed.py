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
   inverse of K(theta_ref) (one GEMM per iteration, MXU speed), with
   residuals computed in split-complex f64 SpMV (exact).  Contraction rate
   ~ max(omega^2/lam_band_edge, eps32 * kappa_deflated) << 1.

AD: wrapped in ``lax.custom_linear_solve`` like the other engines — the
solver internals are a numerical method; gradients flow through the c64
matvec parameters with implicit diff at every order.
"""
from __future__ import annotations

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
    For very large n this becomes the natural Pallas/ILU upgrade point.
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


def _residual_f64(Kr64, Ki64, Ms64, om2_64, b_re, b_im, u_re, u_im,
                  rows, cols, n):
    """r = b - A u with A = (K_r + i K_i) - om^2 M, all in f64 pairs.

    Uses the *true* imaginary stiffness (not a beta projection), so the
    refinement fixed point is exact for arbitrary complex K — including
    per-modulus loss factors (OrthotropicD4)."""
    Ku_re = _spmv64(Kr64, rows, cols, u_re, n)
    Ku_im = _spmv64(Kr64, rows, cols, u_im, n)
    Kiu_re = _spmv64(Ki64, rows, cols, u_re, n)
    Kiu_im = _spmv64(Ki64, rows, cols, u_im, n)
    Mu_re = _spmv64(Ms64, rows, cols, u_re, n)
    Mu_im = _spmv64(Ms64, rows, cols, u_im, n)
    Au_re = Ku_re - Kiu_im - om2_64 * Mu_re
    Au_im = Ku_im + Kiu_re - om2_64 * Mu_im
    return b_re - Au_re, b_im - Au_im


def _residual_prop64(Kr64, beta64, Ms64, om2_64, b_re, b_im, u_re, u_im,
                     rows, cols, n):
    """r = b - A u for A = (1 + i beta) K_r - om^2 M (scalar loss factor).

    K_i = beta K_r exactly for the scalar-loss material families, so the
    two K_i matvecs of the general residual are scalar multiples of the
    K_r ones — 4 SpMVs instead of 6, batched re/im gathers."""
    uu = jnp.stack([u_re, u_im])
    Ku = _spmv64(Kr64, rows, cols, uu, n)
    Mu = _spmv64(Ms64, rows, cols, uu, n)
    Au_re = Ku[0] - beta64 * Ku[1] - om2_64 * Mu[0]
    Au_im = Ku[1] + beta64 * Ku[0] - om2_64 * Mu[1]
    return b_re - Au_re, b_im - Au_im


# ---------------------------------------------------------------------------
# the mixed sweep
# ---------------------------------------------------------------------------

def mixed_sweep(K_re, K_im, M_flat, B_re, B_im, omegas, rows, cols, n: int,
                W64, invK32, n_refine: int = 8, refine_tol: float = 3e-7,
                mg=None, K_ref64=None, freq_chunk: int | None = None,
                ki_proportional: bool = False):
    """f64-grade frequency sweep on f32 hardware — split-complex interface.

    All operator/rhs data arrives as f64 (complex quantities as re/im pairs —
    complex128 is not a TPU type, f64 pairs are): K_re/K_im (nnz,),
    M_flat (nnz,), B_re/B_im (F, n), omegas (F,).
    W64: (n, m) f64 M-orthonormal band basis (static);
    invK32: (n, n) f32 static preconditioner.

    The refinement loop is adaptive: it stops when the relative residual
    drops below ``refine_tol`` (or after ``n_refine`` iterations).  A
    ``while_loop`` is safe here because the solve closure of
    ``custom_linear_solve`` is a numerical method — it is never
    differentiated, so reverse-mode AD is unaffected.

    Complement preconditioner: the dense f32 inverse ``invK32`` by default;
    pass ``mg = {"arrays": ..., "static": ...}`` (from
    ``ops.mg.build_multilevel_host``; arrays as jnp, static as Python
    scalars) plus ``K_ref64`` (static equilibrated reference stiffness, flat
    f64) to use the O(nnz) multilevel V-cycle instead (the 100k-DOF path —
    ``invK32`` may then be a (1, 1) dummy).

    Returns (U_re, U_im) f64 — validated at ~3e-8 relative against f64
    sparse LU including exactly at resonances (tests/test_mixed.py).
    """
    # beta is only the *preconditioner's* model of K_im (band resolvent
    # denominators); the refinement residual uses the true K_im, so the
    # converged solution is exact for arbitrary complex stiffness.
    beta = jnp.vdot(K_re, K_im) / jnp.vdot(K_re, K_re)

    Kr64 = jax.lax.stop_gradient(K_re).astype(jnp.float64)
    Ki64 = jax.lax.stop_gradient(K_im).astype(jnp.float64)
    Ms64 = jax.lax.stop_gradient(M_flat).astype(jnp.float64)
    beta64 = jax.lax.stop_gradient(beta).astype(jnp.float64)

    # ---- per-theta band Rayleigh-Ritz, all f64 --------------------------
    # Kw = W^T K_r W (m x m), Mw = W^T M W; W is M(theta-independent)-
    # orthonormal against the *static* M, which is exact here since M does
    # not depend on theta.
    KW = _spmv64(Kr64, rows, cols, W64.T, n)          # (m, n) rows = K w_i
    MW = _spmv64(Ms64, rows, cols, W64.T, n)
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
    lam_w, Qw = jnp.linalg.eigh(0.5 * (Cw + Cw.T))    # small m x m, f64
    Zw64 = W64 @ Qw                                    # (n, m) band modes, f64

    MZ64 = _spmv64(Ms64, rows, cols, Zw64.T, n).T      # (n, m) M-weighted

    if mg is not None:
        from .mg import multilevel_apply

        def precond(x64):
            return multilevel_apply(mg["arrays"], mg["static"], K_ref64,
                                    rows, cols, x64)
    else:
        def precond(x64):
            # batched (..., n) application of the dense f32 inverse
            y32 = jnp.einsum("ij,...j->...i", invK32,
                             x64.astype(jnp.float32))
            return y32.astype(jnp.float64)

    def one(om, b_re_in, b_im_in):
        om64 = om.astype(jnp.float64)
        om2 = om64 * om64

        def make_solver(sign):
            """Solver for A (sign=+1) or conj(A) (sign=-1).

            In the split-complex real representation, the transpose of
            'multiply by symmetric complex A' is 'multiply by conj(A)'
            ([[Ar,-Ai],[Ai,Ar]]^T = [[Ar,Ai],[-Ai,Ar]]), so the
            transpose_solve of custom_linear_solve must flip the imaginary
            sign — this is what makes reverse-mode gradients exact.
            """
            sb = sign * beta64

            def band_solve_f64(r_re, r_im):
                q_re = Zw64.T @ r_re
                q_im = Zw64.T @ r_im
                dre = lam_w - om2
                dim = sb * lam_w
                den = dre * dre + dim * dim
                y_re = (q_re * dre + q_im * dim) / den
                y_im = (q_im * dre - q_re * dim) / den
                return Zw64 @ y_re, Zw64 @ y_im

            def slv(mv_, bb):
                bb_re, bb_im = bb
                u_re, u_im = band_solve_f64(bb_re, bb_im)
                b_norm2 = jnp.sum(bb_re * bb_re) + jnp.sum(bb_im * bb_im)
                thresh2 = (refine_tol * refine_tol) * b_norm2

                def cond(state):
                    _, _, k, rn2 = state
                    return jnp.logical_and(k < n_refine, rn2 > thresh2)

                def body(state):
                    u_re, u_im, k, _ = state
                    if ki_proportional:
                        r_re, r_im = _residual_prop64(
                            Kr64, sign * beta64, Ms64, om2, bb_re, bb_im,
                            u_re, u_im, rows, cols, n,
                        )
                    else:
                        r_re, r_im = _residual_f64(
                            Kr64, sign * Ki64, Ms64, om2, bb_re, bb_im,
                            u_re, u_im, rows, cols, n,
                        )
                    rn2 = jnp.sum(r_re * r_re) + jnp.sum(r_im * r_im)
                    db_re, db_im = band_solve_f64(r_re, r_im)
                    # deflate band component before the complement precond;
                    # re/im stacked so the preconditioner graph (the
                    # multilevel W-cycle in mg mode) is traced ONCE per
                    # iteration, not twice
                    rr = jnp.stack([r_re, r_im])
                    rc = rr - (MZ64 @ (Zw64.T @ rr.T)).T
                    dc = precond(rc)
                    return (u_re + db_re + dc[0], u_im + db_im + dc[1],
                            k + 1, rn2)

                u_re, u_im, _, _ = jax.lax.while_loop(
                    cond, body,
                    (u_re, u_im, jnp.int32(0), jnp.asarray(jnp.inf, jnp.float64)),
                )
                return (u_re, u_im)

            return slv

        def mv(x):
            """Split-complex A x (f64): x is a (re, im) pair pytree.

            With ``ki_proportional`` the imaginary stiffness matvecs are
            scalar multiples of the real ones (K_i = beta K_r); the traced
            projection ``beta`` makes the tangent map exact for the
            scalar-loss material families: dK_i = dbeta K_r + beta dK_r
            and the projection's differential recovers dbeta exactly."""
            x_re, x_im = x
            if ki_proportional:
                xx = jnp.stack([x_re, x_im])
                Kx = _spmv64(K_re, rows, cols, xx, n)
                Mx = _spmv64(M_flat, rows, cols, xx, n)
                return (Kx[0] - beta * Kx[1] - om2 * Mx[0],
                        Kx[1] + beta * Kx[0] - om2 * Mx[1])
            Kx_re = _spmv64(K_re, rows, cols, x_re, n)
            Kx_im = _spmv64(K_re, rows, cols, x_im, n)
            Kix_re = _spmv64(K_im, rows, cols, x_re, n)
            Kix_im = _spmv64(K_im, rows, cols, x_im, n)
            Mx_re = _spmv64(M_flat, rows, cols, x_re, n)
            Mx_im = _spmv64(M_flat, rows, cols, x_im, n)
            return (Kx_re - Kix_im - om2 * Mx_re,
                    Kx_im + Kix_re - om2 * Mx_im)

        return jax.lax.custom_linear_solve(
            mv, (b_re_in, b_im_in),
            solve=make_solver(1.0), transpose_solve=make_solver(-1.0),
        )

    om64 = omegas.astype(jnp.float64)
    Br64 = B_re.astype(jnp.float64)
    Bi64 = B_im.astype(jnp.float64)
    if freq_chunk is None or freq_chunk >= om64.shape[0]:
        return jax.vmap(one)(om64, Br64, Bi64)

    # Chunk the frequency axis through a scan (lax.map batch_size): bounds
    # the dominant (F, nnz) SpMV gather/scatter intermediates to
    # (chunk, nnz) — at 100k DOF an unchunked 512-pt sweep would hold
    # ~10 GB contributions; chunking also keeps the AOT compile tractable
    # for jacfwd-of-sweep at >12k DOF (measured: the unchunked r+J graph
    # fails to compile at 21k, the chunked one compiles in ~2 min).
    # lax.map applies ``one`` per frequency and vmaps internally over
    # batch_size-sized chunks (scan across chunks)
    return jax.lax.map(lambda a: one(*a), (om64, Br64, Bi64),
                       batch_size=int(freq_chunk))
