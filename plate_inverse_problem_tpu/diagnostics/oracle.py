"""f64 sparse-LU oracle for FRF accuracy audits.

The mixed engine's FGMRES has no per-solve convergence signal a caller can
read (the solve lives inside ``lax.custom_linear_solve``); a silently
unconverged lane would surface only as a wrong FRF value.  This module
makes that failure mode *detectable from the public API*: it re-solves a
handful of frequencies (always including the resonance peak — the
worst-conditioned point) with scipy's f64 ``splu`` on the host — the same
arithmetic as the reference's UMFPACK recipe (InnerState.h:240-305) — and
reports the worst relative readout error of the engine's sweep.

This is the formalization of the spot check bench.py and the scale-tier
probes run inline; tolerances: the mixed engine targets <=5e-6 worst
(<=1e-7 typical at the bench tier), modal-on-TPU ~1e-3, direct/modal on
CPU ~1e-12.
"""
from __future__ import annotations

import numpy as np

__all__ = ["frf_oracle", "oracle_check", "polish_peaks"]


def _host_system(problem, params, omega: float):
    """(A_dyn_csc, rhs) of the UNSCALED reduced system at one
    angular frequency — mirrors the core's operator algebra
    (problem.py getFRCore) in plain f64/complex128 numpy."""
    import scipy.sparse as sp

    op = problem.op
    n = problem.n_free
    h = problem.geometry.height
    freq_dep = problem._transform_is_freq_dependent()

    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        if problem.is_symmetric_path:
            D = np.asarray(problem.material.get_D_transform(h)(
                np.asarray(params), omega if freq_dep else 0.0))
            K_flat = np.einsum("k,kn->n", D, np.asarray(op.Ks))
            bK = np.einsum("k,kn->n", D, np.asarray(op.fKs))
        else:
            from ..fem.assembly import MODULI_INDICES

            Av, Bv, Dv = (np.asarray(x) for x in
                          problem.material.get_ABD_transform(h)(
                              np.asarray(params),
                              omega if freq_dep else 0.0))
            K_flat = np.zeros(op.pattern.nnz, dtype=np.complex128)
            bK = np.zeros(n, dtype=np.complex128)
            for i, s in enumerate(MODULI_INDICES):
                K_flat += (Av[i] * op.mats["A" + s]
                           + Bv[i] * op.mats["B" + s]
                           + Dv[i] * op.mats["D" + s])
                bK += (Av[i] * op.lifts["A" + s]
                       + Bv[i] * op.lifts["B" + s]
                       + Dv[i] * op.lifts["D" + s])

    rows, cols = op.pattern.rows, op.pattern.cols
    M_flat = np.asarray(problem.MInertia)
    A = sp.csc_matrix(
        (K_flat.astype(np.complex128) - omega ** 2 * M_flat,
         (rows, cols)), shape=(n, n))
    rhs = bK.astype(np.complex128) - omega ** 2 * np.asarray(problem.fInertia)
    return A, rhs


def _readout(problem, u: np.ndarray):
    """Scalar FRF readout of a full solution vector — same formula as the
    compiled cores (complex interpolation for the symm path, accelerometer
    magnitude for the 3-field path)."""
    op = problem.op
    if problem.is_symmetric_path:
        return (op.interpolation_value_from_bc
                + u @ np.asarray(op.interpolation_vector))
    acc = problem.accelerometer
    eff = acc.effective_height * acc.height
    ts = acc.transverse_sensitivity

    def row(name):
        R, r0 = op.readout[name]
        return np.asarray(R.mean(axis=0)), float(r0.mean())

    cu, ou = row("u")
    cv, ov = row("v")
    cw, ow = row("w")
    cwx, owx = row("wx")
    cwy, owy = row("wy")
    uu = (cu - eff * cwx) @ u + (ou - eff * owx)
    vv = (cv - eff * cwy) @ u + (ov - eff * owy)
    ww = cw @ u + ow
    return np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)


def frf_oracle(problem, freqs_hz, params=None) -> np.ndarray:
    """Reference-recipe FRF (f64 splu per frequency) at ``freqs_hz``."""
    import scipy.sparse.linalg as spla

    if params is None:
        params = np.asarray(problem.parameters)
    out = []
    for f in np.atleast_1d(np.asarray(freqs_hz, dtype=np.float64)):
        om = 2.0 * np.pi * float(f)
        A, rhs = _host_system(problem, params, om)
        u = spla.splu(A).solve(rhs)
        out.append(_readout(problem, u))
    return np.asarray(out)


def _peak_indices(mag: np.ndarray, peaks) -> list[int]:
    """Indices to polish: explicit index list, or the ``peaks`` largest
    local maxima of |FRF| (the global argmax always included)."""
    if not np.isscalar(peaks):
        return sorted({int(i) for i in np.asarray(peaks).ravel()})
    k = int(peaks)
    if k < 1:
        return []
    interior = np.arange(1, mag.size - 1)
    is_max = (mag[interior] >= mag[interior - 1]) & (mag[interior] >= mag[interior + 1])
    cand = interior[is_max]
    cand = cand[np.argsort(mag[cand])[::-1]][:k]
    return sorted({int(np.argmax(mag)), *cand.tolist()}
                  if cand.size else {int(np.argmax(mag))})


def polish_peaks(problem, freqs_hz, fr=None, params=None, peaks=1,
                 passes: int = 1):
    """Host-exact residual correction at scanned |FRF| peaks.

    Why this exists: the axon TPU's emulated f64 elementwise ops are not
    exactly rounded (multiply ~120 eps; adds ~3 eps ABSOLUTE on cancelling
    operands — measured, CLAUDE.md / SCALE.md), and an in-graph residual of
    a near-resonant solve cancels by 1e6-1e9, so chip-side FRF accuracy AT
    scanned resonance peaks floors at ~1e-5..1e-4 no matter the Krylov
    budget.  Off-peak points are unaffected (1e-9..1e-7).  The measured
    remedy (.probes/peak_resid.py REFINE_BACK: 1.4e-7 from a 2e-5 floor at
    n=21k) is to compute ONE residual of the converged iterate on the HOST
    — where f64 is exactly rounded — and feed it back through the engine
    as a fresh right-hand side.

    Each pass costs one host SpMV (O(nnz), no factorization) plus one
    batched engine solve over the selected peaks.  Engines without the
    mixed-core solve hooks fall back to replacing the peak values with the
    full :func:`frf_oracle` (host f64 splu — exact, pays a factorization).

    Parameters: ``peaks`` — int k (polish the k largest |FRF| local maxima)
    or an explicit index list; ``passes`` — host-residual correction rounds
    (1 suffices at the measured floor; 2 for deliberately small Krylov
    budgets).  ``fr``: an existing sweep over ``freqs_hz`` to polish
    (computed via ``solveForward`` when omitted).

    Returns ``(fr_polished, info)`` where ``info`` carries the polished
    indices/frequencies and the mode ('residual' or 'oracle').

    Reference counterpart: none — the reference's UMFPACK solves (
    InnerState.h:164-308) run in exactly-rounded host f64 throughout and
    need no peak polish; this restores that accuracy grade on the chip.
    """
    import jax
    import jax.numpy as jnp

    freqs_hz = np.asarray(freqs_hz, dtype=np.float64)
    if params is None:
        params = np.asarray(problem.parameters)
    if fr is None:
        fr = problem.solveForward(freqs_hz, params)
    fr = np.array(fr, copy=True)
    idxs = _peak_indices(np.abs(fr), peaks)
    if not idxs:
        return fr, {"indices": [], "mode": "none"}

    core, od = problem.getFRCore()
    scale = getattr(problem, "_eq_scale", None)
    hooked = (scale is not None
              and all(hasattr(core, a) for a in ("sweep_u", "sweep_adj")))
    if not hooked:
        for i in idxs:
            fr[i] = frf_oracle(problem, freqs_hz[i], params)[0]
        return fr, {"indices": idxs, "mode": "oracle",
                    "freqs_hz": [float(freqs_hz[i]) for i in idxs]}

    layout = getattr(problem, "_band_layout", None)
    perm = None if layout is None else np.asarray(layout.perm)

    def to_phys(vt):
        """device (equilibrated, RCM-permuted) -> physical solution."""
        if perm is not None:
            vp = np.empty_like(vt)
            vp[perm] = vt
        else:
            vp = vt
        return scale * vp

    def to_dev(v):
        """physical rhs -> device (equilibrated, RCM-permuted) rhs."""
        vt = scale * v
        return vt[perm] if perm is not None else vt

    th = jnp.asarray(params)
    fsel = jnp.asarray(freqs_hz[idxs])
    sweep_u = jax.jit(lambda f, p, o: core.sweep_u(f, p, o))
    sweep_adj = jax.jit(
        lambda f, p, o, gr, gi: core.sweep_adj(f, p, o, gr, gi))

    U_re, U_im = sweep_u(fsel, th, od)
    us = [to_phys(np.asarray(U_re[k]) + 1j * np.asarray(U_im[k]))
          for k in range(len(idxs))]
    systems = [_host_system(problem, params, 2.0 * np.pi * freqs_hz[i])
               for i in idxs]

    # monotone safeguard: every pass is accepted per peak only if it
    # LOWERED the exact host residual norm — a correction through an
    # engine solve that is not contracting (e.g. a deliberately starved
    # Krylov budget far from the basis theta) would otherwise amplify;
    # with the safeguard, polish can never return worse than its input.
    best_u = list(us)
    best_rn = [np.inf] * len(idxs)
    improved = [False] * len(idxs)

    def _residuals(cur):
        return [rhs - A @ u for (A, rhs), u in zip(systems, cur)]

    for p_i in range(max(1, int(passes)) + 1):
        rs = _residuals(us)
        for k, r in enumerate(rs):
            rn = float(np.linalg.norm(r))
            if rn < best_rn[k]:
                best_rn[k] = rn
                best_u[k] = us[k]
                improved[k] = p_i > 0
        if p_i == max(1, int(passes)):
            break
        # exact host residuals of the current iterates (the one place the
        # chip cannot do this arithmetic), batched back through the engine.
        # A is complex symmetric, so A d = r solves through the adjoint
        # hook (conj(A) y = g) as d = conj(y) with g = conj(r).
        rts = np.stack([to_dev(r) for r in rs])
        G_re = jnp.asarray(np.ascontiguousarray(rts.real))
        G_im = jnp.asarray(np.ascontiguousarray(-rts.imag))
        Y_re, Y_im = sweep_adj(fsel, th, od, G_re, G_im)
        Y_re = np.asarray(Y_re)
        Y_im = np.asarray(Y_im)
        us = [u + to_phys(Y_re[k] - 1j * Y_im[k])
              for k, u in enumerate(us)]

    for k, i in enumerate(idxs):
        if improved[k]:
            # host readout of the polished solution; unimproved peaks keep
            # the engine's own value verbatim
            fr[i] = _readout(problem, best_u[k])
    return fr, {"indices": idxs, "mode": "residual", "passes": int(passes),
                "improved": improved,
                "freqs_hz": [float(freqs_hz[i]) for i in idxs]}


def oracle_check(problem, freqs_hz, params=None, fr=None,
                 n_points: int = 4) -> dict:
    """Audit an engine sweep against the f64 oracle at ``n_points``
    frequencies: the |FRF| peak (always) plus points spread across the
    band.  ``fr``: the engine's own sweep over ``freqs_hz`` (computed via
    ``getFRFunction`` when omitted).

    Returns ``{"worst_rel_err", "at_hz", "checked_hz", "engine"}``.
    """
    freqs_hz = np.asarray(freqs_hz, dtype=np.float64)
    if params is None:
        params = np.asarray(problem.parameters)
    if fr is None:
        fr = problem.getFRFunction()(freqs_hz, params)
    fr = np.asarray(fr)

    F = freqs_hz.size
    idxs = {int(np.argmax(np.abs(fr)))}
    for i in np.linspace(0, F - 1, max(1, n_points - 1)).round().astype(int):
        idxs.add(int(i))
    idxs = sorted(idxs)

    worst, at = 0.0, float(freqs_hz[idxs[0]])
    for i in idxs:
        ref_i = frf_oracle(problem, freqs_hz[i], params)[0]
        rel = abs(fr[i] - ref_i) / max(abs(ref_i), 1e-300)
        if rel > worst:
            worst, at = float(rel), float(freqs_hz[i])
    return {
        "worst_rel_err": worst,
        "at_hz": at,
        "checked_hz": [float(freqs_hz[i]) for i in idxs],
        "engine": problem._engine(),
    }
