"""Frequency-sweep solvers with implicit-diff AD.

Solves ``A(omega_f) u_f = b_f`` for a batch of frequencies, where
``A(omega) = K_c - omega^2 M`` over a static sparsity pattern, and returns the
full solution batch U (F, N).

AD contract (the same implicit-diff semantics as the reference's hand-written
primitive rules, Sparse.py:200-222):

* tangent:  du = A^{-1} (db - dA u)
* cotangent flows through the transposed (linear) tangent map; A is complex
  *symmetric* here, so the adjoint solve reuses the same resolvent.

Gradients never unroll the solver and never differentiate the eigenbasis.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .scatter import to_dense, spmv_flat
from .spectral import modal_basis_from_flat


def _loss_factor(K_flat):
    """Extract beta from K = (1+i*beta) K_r by least-squares projection."""
    kr = jnp.real(K_flat)
    ki = jnp.imag(K_flat)
    return jnp.vdot(kr, ki).real / jnp.vdot(kr, kr).real


# ---------------------------------------------------------------------------
# modal engine
# ---------------------------------------------------------------------------

def _modal_solve(K_flat, M_flat, B, Z, lam, omegas, rows, cols,
                 refine_steps: int = 2):
    """Batched resolvent solve via ``lax.custom_linear_solve``.

    The linear operator ``A(omega) x = K x - omega^2 M x`` is expressed as a
    flat-pattern SpMV (the ``matvec``); the numerical solve applies the modal
    resolvent ``Z diag(1/d) Z^T`` followed by ``refine_steps`` rounds of
    iterative refinement (u += R(b - A u)).  Refinement makes the solve
    accuracy eps-of-the-matvec even when the eigenbasis itself carries f32
    drift (the block-Jacobi basis on TPU): each round contracts the error by
    the basis residual.

    ``custom_linear_solve`` owns the implicit-diff AD: gradients w.r.t. K/M
    flow through the matvec parameters at any differentiation order, while
    the solve closure (Z, lam) is a numerical method and receives none —
    the adjoint-method contract of the reference's primitives
    (Sparse.py:200-222), arbitrarily composable with vmap/jvp/vjp.

    A is complex *symmetric* (not Hermitian): transpose_solve == solve.
    """
    n = Z.shape[0]
    beta = _loss_factor(K_flat)
    c = 1.0 + 1j * beta

    def one(om, b):
        d = c * lam - om**2

        def mv(x):
            return spmv_flat(K_flat, rows, cols, x, n) - (om**2) * spmv_flat(
                M_flat.astype(x.dtype), rows, cols, x, n
            )

        def apply_resolvent(bb):
            return Z @ ((Z.T @ bb) / d)

        def slv(mv_, bb):
            u = apply_resolvent(bb)
            for _ in range(refine_steps):
                u = u + apply_resolvent(bb - mv_(u))
            return u

        return jax.lax.custom_linear_solve(
            mv, b, solve=slv, transpose_solve=slv
        )

    return jax.vmap(one)(omegas, B)


def modal_sweep(K_flat, M_flat, B, omegas, rows, cols, n: int,
                n_modes: int | None = None, refine_steps: int = 2):
    """Exact modal-resolvent sweep for ``K_c = (1+i*beta) K_r``.

    One generalized eigh of (Re K, M) + two matmuls for the whole sweep.
    ``n_modes`` optionally truncates the basis (Rayleigh-Ritz approximation;
    default exact/full).

    The eigenbasis is polished with Rayleigh quotients against the *flat*
    operators (exact to matvec precision, O(nnz*N)): eigenvalues from a
    drifted f32 basis are re-derived as lam_i = z_i^T K z_i / z_i^T M z_i and
    the basis rescaled to unit M-norm — this plus resolvent refinement keeps
    the solve at matvec accuracy on TPU f32.
    """
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    Kr = jnp.real(K_flat)
    lam, Z = modal_basis_from_flat(Kr, M_flat, rows, cols, n)

    # Rayleigh-quotient polish (all under stop_gradient: the basis is a
    # numerical method, not a differentiation path)
    Krs = jax.lax.stop_gradient(Kr)
    Ms = jax.lax.stop_gradient(M_flat)
    KZ = spmv_flat(Krs, rows, cols, Z.T, n)   # (N_modes, N) rows = K z_i
    MZ = spmv_flat(Ms, rows, cols, Z.T, n)
    zKz = jnp.sum(Z.T * KZ, axis=1)
    zMz = jnp.sum(Z.T * MZ, axis=1)
    lam = zKz / zMz
    Z = Z / jnp.sqrt(zMz)[None, :]

    if n_modes is not None:
        lam = lam[:n_modes]
        Z = Z[:, :n_modes]
    return _modal_solve(
        K_flat, M_flat, B, Z, lam, omegas, rows, cols,
        refine_steps=refine_steps,
    )


# ---------------------------------------------------------------------------
# direct engine
# ---------------------------------------------------------------------------

def direct_sweep(K_flat, M_flat, B, omegas, rows, cols, n: int,
                 chunk: int = 16, refine_steps: int | None = None):
    """Chunked batched dense LU over the frequency sweep.

    Exact for arbitrary complex stiffness (OrthotropicD4's per-modulus loss
    factors, frequency-dependent moduli).  ``jax.checkpoint`` keeps backward
    memory at one chunk of factors (the reference instead refactorizes per
    solve, InnerState.h:251-305).

    On f32 hardware a plain complex64 LU cannot resolve the equilibrated
    plate operator's resonances (the ~1e8 spectral spread sinks the
    factorization).  ``refine_steps`` rounds of iterative refinement with
    the residual evaluated in *split-complex f64* flat-pattern SpMV (exact
    elementwise — the same trick as ops/mixed) recover f64-grade solutions
    from the f32 factor: error contracts by ~eps32*kappa per round.
    Default: 4 rounds when the working dtype is complex64, 0 for
    complex128 (the LU is already exact).  AD is implicit
    (``lax.custom_linear_solve``; A is complex symmetric so the transpose
    solve is the same solve — the counterpart of the reference's f64
    UMFPACK guarantee, InnerState.h:164-308).
    """
    from .mixed import _residual_general

    K_flat = jnp.asarray(K_flat)
    freq_dep = K_flat.ndim == 2
    cdt = K_flat.dtype
    if refine_steps is None:
        refine_steps = 0 if cdt == jnp.complex128 else 4

    Md = to_dense(M_flat, rows, cols, n).astype(cdt)
    if not freq_dep:
        Kd = to_dense(K_flat, rows, cols, n)

    def one_factory(kf):
        """Solve A(om) u = b for one frequency with implicit-diff AD."""

        def solve_one(om, b):
            A = (to_dense(kf, rows, cols, n) if freq_dep else Kd) \
                - (om ** 2) * Md
            lu, piv = jax.scipy.linalg.lu_factor(A)

            Kr64 = jax.lax.stop_gradient(jnp.real(kf)).astype(jnp.float64)
            Ki64 = jax.lax.stop_gradient(jnp.imag(kf)).astype(jnp.float64)
            Ms64 = jax.lax.stop_gradient(
                jnp.asarray(M_flat)).astype(jnp.float64)
            om64 = jax.lax.stop_gradient(om).astype(jnp.float64)

            def slv(mv_, bb):
                u = jax.scipy.linalg.lu_solve((lu, piv), bb)
                if refine_steps == 0:
                    return u
                b_re = jnp.real(bb).astype(jnp.float64)
                b_im = jnp.imag(bb).astype(jnp.float64)
                u_re = jnp.real(u).astype(jnp.float64)
                u_im = jnp.imag(u).astype(jnp.float64)
                for _ in range(refine_steps):
                    r_re, r_im = _residual_general(
                        lambda x: spmv_flat(Kr64, rows, cols, x, n),
                        lambda x: spmv_flat(Ki64, rows, cols, x, n),
                        lambda x: spmv_flat(Ms64, rows, cols, x, n),
                        1.0, om64 * om64, b_re, b_im, u_re, u_im)
                    d = jax.scipy.linalg.lu_solve(
                        (lu, piv),
                        (r_re + 1j * r_im).astype(cdt))
                    u_re = u_re + jnp.real(d).astype(jnp.float64)
                    u_im = u_im + jnp.imag(d).astype(jnp.float64)
                return (u_re + 1j * u_im).astype(cdt)

            def mv(x):
                Kx = spmv_flat(kf, rows, cols, x, n)
                Mx = spmv_flat(jnp.asarray(M_flat).astype(x.dtype),
                               rows, cols, x, n)
                return Kx - (om ** 2) * Mx

            # A is complex *symmetric*: transpose solve == solve
            return jax.lax.custom_linear_solve(
                mv, b, solve=slv, transpose_solve=slv)

        return solve_one

    if freq_dep:
        @jax.checkpoint
        def one_fd(args):
            om, b, kf = args
            return one_factory(kf)(om, b)

        return jax.lax.map(one_fd, (omegas, B, K_flat), batch_size=chunk)

    solve_one = one_factory(K_flat)

    @jax.checkpoint
    def one(args):
        om, b = args
        return solve_one(om, b)

    return jax.lax.map(one, (omegas, B), batch_size=chunk)


def sweep_solve(K_flat, M_flat, B, omegas, rows, cols, n: int,
                engine: str = "modal", n_modes: int | None = None,
                chunk: int = 16, W64=None, invK32=None, n_refine: int = 12):
    """Engine dispatch. B: (F, N) complex right-hand sides.

    Engines: 'modal' (one eigh + matmuls; exact in f64, fast-approximate in
    f32), 'direct' (chunked dense LU), 'mixed' (f64-grade on f32 hardware:
    band Rayleigh-Ritz + deflated refinement — needs the static ``W64`` /
    ``invK32`` operators from ``ops.mixed``).
    """
    if engine == "modal":
        return modal_sweep(K_flat, M_flat, B, omegas, rows, cols, n, n_modes)
    elif engine == "direct":
        return direct_sweep(K_flat, M_flat, B, omegas, rows, cols, n, chunk)
    elif engine == "mixed":
        from .mixed import mixed_sweep

        if W64 is None or invK32 is None:
            raise ValueError("engine='mixed' needs W64 and invK32 operators.")
        return mixed_sweep(K_flat, M_flat, B, omegas, rows, cols, n,
                           W64, invK32, n_refine=n_refine)
    else:
        raise ValueError(
            f"Unknown sweep engine {engine!r}; use 'modal'/'direct'/'mixed'."
        )
