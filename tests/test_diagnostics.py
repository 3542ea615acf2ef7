"""Diagnostics: profiler trace capture (SURVEY §5), peak polish."""
import numpy as np
import pytest


def test_polish_peaks_restores_resonance_accuracy():
    """polish_peaks — the productized SCALE.md peak remedy.  One host-exact
    residual correction fed back through the engine restores splu-grade
    accuracy at the scanned |FRF| peak (measured 1.4e-7 from the 2e-5 chip
    floor at n=21k, .probes/peak_resid.py REFINE_BACK); on CPU the same
    mechanism takes a perturbed-theta peak from ~1e-6 to ~1e-10.  The
    monotone safeguard keeps polish from ever returning worse than its
    input, and engines without solve hooks fall back to oracle replacement.
    """
    import plate_inverse_problem_tpu as pip
    from plate_inverse_problem_tpu.diagnostics import frf_oracle, polish_peaks

    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
        ny=1)
    freqs = np.linspace(60.0, 400.0, 17)

    # converged solve, theta perturbed off the band-basis reference: the
    # scanned peak carries the largest residual error; one polish pass
    # lands it at the splu oracle
    p = pip.Problem(geom, mat, acc, engine="mixed")
    th = np.asarray(p.parameters) * np.array([1.1, 0.9, 1.2])
    fr = np.asarray(p.solveForward(freqs, th))
    i = int(np.argmax(np.abs(fr)))
    ref = frf_oracle(p, freqs[i], th)[0]
    e_before = abs(fr[i] - ref) / abs(ref)
    fr_pol, info = polish_peaks(p, freqs, fr=fr, params=th, passes=1)
    e_after = abs(fr_pol[i] - ref) / abs(ref)
    assert info["mode"] == "residual" and i in info["indices"]
    assert e_after < 1e-8, (e_before, e_after)
    assert e_after < 0.1 * e_before, (e_before, e_after)
    # off-peak values are untouched
    mask = np.ones(freqs.size, bool)
    mask[info["indices"]] = False
    assert np.array_equal(fr_pol[mask], fr[mask])

    # solveForward(polish_peaks=True) is the same operation
    fr_sf = np.asarray(p.solveForward(freqs, th, polish_peaks=True))
    np.testing.assert_allclose(fr_sf, fr_pol, rtol=1e-12, atol=0.0)

    # monotone safeguard: a starved budget far from the basis theta makes
    # the correction solve non-contracting — polish must return the input
    # value verbatim rather than an amplified one
    p_bad = pip.Problem(geom, mat, acc, engine="mixed", n_refine=1,
                        refine_tol=1e-14)
    th_bad = np.asarray(p_bad.parameters) * np.array([1.35, 0.72, 1.6])
    fr_bad = np.asarray(p_bad.solveForward(freqs, th_bad))
    fr_bp, info_bad = polish_peaks(p_bad, freqs, fr=fr_bad, params=th_bad,
                                   passes=2)
    assert info_bad["improved"] == [False]
    np.testing.assert_array_equal(fr_bp, fr_bad)

    # hook-less engines (modal/direct) fall back to exact oracle replacement
    p_modal = pip.Problem(geom, mat, acc, engine="modal")
    fr_m = np.asarray(p_modal.solveForward(freqs))
    fr_mp, info_m = polish_peaks(p_modal, freqs, fr=fr_m)
    assert info_m["mode"] == "oracle"
    im = info_m["indices"][0]
    ref_m = frf_oracle(p_modal, freqs[im])[0]
    assert fr_mp[im] == pytest.approx(ref_m, rel=0, abs=0)


def test_profiler_trace_capture(tmp_path):
    """diagnostics.profile.trace produces an XLA trace artifact
    (SURVEY §5 tracing row)."""
    import os
    import jax.numpy as jnp
    import jax
    from plate_inverse_problem_tpu.diagnostics.profile import profile_call

    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    out, run, dt = profile_call(fn, x, label="unit", logdir=str(tmp_path))
    assert float(out) == 64.0 * 64.0 * 64.0
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(run) for f in fs]
    assert files, "no trace artifacts written"
