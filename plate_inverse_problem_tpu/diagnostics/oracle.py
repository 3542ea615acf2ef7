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

__all__ = ["frf_oracle", "oracle_check"]


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
