"""Quantitative physics-parity tooling vs the reference implementation.

The reference publishes fixed-mesh golden FRF checksums
(/root/reference/examples/basics.py:30 -> 341.9363 for the 'symm' strip;
/root/reference/examples/cpu_benchmark.py:24-27 -> 8416.4399 for 'sh_i').
Those checksums sample the FRF at/near resonance peaks of a Q ~ 1/(2*beta)
~ 170 structure, so an O(h^2) resonance shift of ~1e-3 relative moves
individual samples by O(1): the golden values are regression constants of
the reference's *specific FreeFEM triangulation*, not converged physical
observables.  No independent FEM code reproduces them to 1e-6 — including
a refined run of the reference itself.

What CAN be verified quantitatively (tests/test_golden_parity.py):

1. our resonance frequencies converge at the element's O(h^2) rate and
   Richardson-extrapolate to stable continuum values;
2. the reference checksum lies inside the interval our FRF model sweeps
   when each in-band eigenvalue moves within the reference mesh's own
   O(h^2) error bar (the reference mesh uses the same border-density
   convention as our ny-matched template, so the bar is |c_i| * h_ref^2
   with c_i fitted from our own mesh family).

The machinery: a mode-acceleration modal expansion of the accelerometer
FRF whose eigenvalues can be perturbed after the fact, making the
checksum-vs-spectrum sensitivity cheap to sweep.
"""
from __future__ import annotations

import numpy as np


def modal_frf_expansion(problem, f_max_hz: float, margin: float = 1.6,
                        n_modes_min: int = 12):
    """Mode-acceleration expansion of the 3-field accelerometer FRF.

    For a scalar-loss material (K_c = (1+i*beta) K_re), the readout
    channel j of the reference FRF model (Problem core) is

        y_j(om) = r0_j + r_j . u(om),
        ((1+i b) K - om^2 M) u = (1+i b) bK - om^2 fM

    Mode acceleration splits u into the exact static response plus the
    dynamic correction of the ``m`` retained modes (M-orthonormal pairs
    (lam_i, z_i) of (K_re, M)):

        u(om) = Kc^{-1} b(om)
              + sum_i z_i (z_i . b(om)) [ 1/((1+ib)lam_i - om^2)
                                          - 1/((1+ib)lam_i) ]

    which is exact apart from an O(om^4 / lam_m^2) tail — the retained
    band covers ``margin * f_max``.  Everything reduces to per-mode
    scalars, so eigenvalue perturbations re-evaluate in O(F * m).

    Returns a dict consumed by :func:`frf_from_expansion`.

    Reference model being expanded: Problem.py:377-518 (forward FR),
    accelerometer magnitude readout Problem.py:454-462.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    if problem.is_symmetric_path:
        raise NotImplementedError("parity study targets the 3-field path")
    if not problem.material.scalar_loss_factor:
        raise NotImplementedError("expansion assumes K = (1+i*beta) K_re")

    _, od = problem.getFRCore()
    od = {k: np.asarray(v) for k, v in od.items()
          if k in ("rows", "cols", "MIn", "fIn", "ABD", "fABD",
                   "ru", "rv", "rw", "r0")}
    n = problem.n_free
    rows, cols = od["rows"], od["cols"]

    theta = np.asarray(problem.parameters, np.float64)
    h = problem.geometry.height
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        Av, Bv, Dv = (np.asarray(x) for x in
                      problem.material.get_ABD_transform(h)(theta, 0.0))
    coeffs = np.stack([Av, Bv, Dv])          # (3, 6) complex
    beta = float(np.imag(coeffs).sum() / np.real(coeffs).sum())
    K_re = np.einsum("mk,mkn->n", coeffs.real, od["ABD"])
    bK_re = np.einsum("mk,mkn->n", coeffs.real, od["fABD"])

    K = sp.csc_matrix((K_re, (rows, cols)), shape=(n, n))
    K = 0.5 * (K + K.T)
    M = sp.csc_matrix((od["MIn"], (rows, cols)), shape=(n, n))
    M = 0.5 * (M + M.T)

    om_band = (2.0 * np.pi * margin * f_max_hz) ** 2
    m = n_modes_min
    while True:
        lam, Z = spla.eigsh(K, k=min(m, n - 2), M=M, sigma=0, which="LM")
        order = np.argsort(lam)
        lam, Z = lam[order], Z[:, order]
        if lam[-1] >= om_band or m >= n - 2:
            break
        m *= 2
    keep = max(int(np.searchsorted(lam, om_band)) + 1, n_modes_min)
    keep = min(keep, lam.size)
    lam, Z = lam[:keep], Z[:, :keep]

    fM = od["fIn"]
    lu = spla.splu(K)
    u_stat_b = lu.solve(bK_re)    # K^{-1} bK_re   (real)
    u_stat_m = lu.solve(fM)       # K^{-1} fM      (real)

    rvecs = np.stack([od["ru"], od["rv"], od["rw"]])   # (3, n)
    return {
        "beta": beta,
        "lam": lam,
        "a": Z.T @ bK_re,                  # (m,)  z_i . bK_re
        "mm": Z.T @ fM,                    # (m,)  z_i . fM
        "p": rvecs @ Z,                    # (3, m) readout projections
        "stat_b": rvecs @ u_stat_b,        # (3,)
        "stat_m": rvecs @ u_stat_m,        # (3,)
        "r0": od["r0"],                    # (3,)
        "ts": problem.accelerometer.transverse_sensitivity,
    }


def frf_from_expansion(exp, freqs_hz, lam_scale=None):
    """|FRF| from a modal expansion, optionally with per-mode eigenvalue
    scale factors ``lam_scale`` (the spectrum-sensitivity knob)."""
    lam = exp["lam"] * (1.0 if lam_scale is None else np.asarray(lam_scale))
    om2 = (2.0 * np.pi * np.asarray(freqs_hz)) ** 2          # (F,)
    cb = 1.0 + 1j * exp["beta"]

    # static (mode-acceleration) part: Kc^{-1} b(om) = (bK_re/1 - om^2
    # fM/cb) projected -- note Kc^{-1}(1+ib)bK_re = K^{-1}bK_re exactly.
    y_stat = (exp["stat_b"][:, None]
              - om2[None, :] * exp["stat_m"][:, None] / cb)   # (3, F)

    b_i = cb * exp["a"][:, None] - om2[None, :] * exp["mm"][:, None]  # (m,F)
    gain = 1.0 / (cb * lam[:, None] - om2[None, :]) - 1.0 / (cb * lam[:, None])
    y_dyn = np.einsum("jm,mf->jf", exp["p"], b_i * gain)      # (3, F)

    y = exp["r0"][:, None] + y_stat + y_dyn
    ts = exp["ts"]
    return np.sqrt(ts * ts * (np.abs(y[0]) ** 2 + np.abs(y[1]) ** 2)
                   + np.abs(y[2]) ** 2)


def resonances_hz(exp, f_max_hz):
    """In-band undamped resonance frequencies from an expansion."""
    f = np.sqrt(exp["lam"]) / (2.0 * np.pi)
    return f[f <= f_max_hz]


def richardson(f_coarse, f_mid, f_fine, r: float = 2.0):
    """Per-mode Richardson extrapolation for an O(h^p) family at mesh
    ratio ``r``: returns (f_extrapolated, p_observed, c_rel) where
    ``c_rel`` is the relative shift of the *coarsest* level from the
    limit — the mesh family's own error bar at coarse h."""
    k = min(len(f_coarse), len(f_mid), len(f_fine))
    fc, fm, ff = (np.asarray(x[:k], np.float64)
                  for x in (f_coarse, f_mid, f_fine))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = (fc - fm) / (fm - ff)
        p_obs = np.log(np.abs(ratio)) / np.log(r)
    rp = r ** 2.0  # extrapolate assuming the element's nominal O(h^2)
    f_star = ff + (ff - fm) / (rp - 1.0)
    c_rel = (fc - f_star) / f_star
    return f_star, p_obs, c_rel


def checksum_interval(exp, freqs_hz, c_rel, slack: float = 2.0,
                      n_samples: int = 4000, seed: int = 0):
    """Range of the FRF checksum sum(|fr|) as each in-band eigenvalue
    moves within ±slack * |c_rel_i| (relative) — the spread of checksums
    an equally-converged independent discretization can legitimately
    produce.  Extreme corners plus random interior samples."""
    m = exp["lam"].size
    k = min(m, len(c_rel))
    bar = np.zeros(m)
    bar[:k] = slack * np.abs(np.asarray(c_rel)[:k])
    # eigenvalue scale = (f-scale)^2
    rng = np.random.default_rng(seed)
    lo = hi = None
    samples = [np.ones(m), (1.0 + bar) ** 2, (1.0 - bar) ** 2]
    for _ in range(n_samples):
        samples.append((1.0 + bar * rng.uniform(-1.0, 1.0, m)) ** 2)
    for s in samples:
        cs = float(frf_from_expansion(exp, freqs_hz, lam_scale=s).sum())
        lo = cs if lo is None else min(lo, cs)
        hi = cs if hi is None else max(hi, cs)
    return lo, hi
