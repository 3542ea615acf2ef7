"""Quantitative parity vs the reference implementation
(docs/GOLDEN_PARITY.md — fast asserted subset of the full study,
.probes/golden_parity_study.py).

What is provable is asserted hard (bit-equal material transforms, static
limit, expansion-vs-solver agreement, convergence bracket); the golden
checksums are shown to lie inside the checksum interval spanned by the
reference mesh's own resonance error bar.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.diagnostics.parity import (
    checksum_interval, frf_from_expansion, modal_frf_expansion, richardson)
from plate_inverse_problem_tpu.diagnostics.ritz import (
    clamped_strip_frequencies)

REF_MATERIAL = "/root/reference/source/jax_plate/Material.py"
E, G, BETA, RHO, H = 200e9, 75e9, 0.003, 7920.0, 2e-3
NU = E / (2 * G) - 1


@pytest.fixture(scope="module")
def acc():
    return pip.Accelerometer("AP1030")


@pytest.fixture(scope="module")
def mat():
    return pip.get_material(RHO, "isotropic", E=E, G=G, beta=BETA)


def _symm(acc, mat, ny, accel=True):
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, H, 10e-3, None), ny=ny
    )
    return pip.Problem(geom, mat, acc if accel else None)


@pytest.mark.skipif(not os.path.exists(REF_MATERIAL),
                    reason="reference checkout not available")
def test_reference_material_transform_bit_equal(mat):
    """The theta -> (A, B, D) map matches the reference Material.py with
    zero error (its module runs standalone under a stub package)."""
    pkg = types.ModuleType("jax_plate")
    pkg.__path__ = []
    utils = types.ModuleType("jax_plate.Utils")
    utils.get_jax_plate_dir = lambda: os.path.dirname(REF_MATERIAL)
    saved = {k: sys.modules.get(k) for k in
             ("jax_plate", "jax_plate.Utils", "jax_plate.Material")}
    sys.modules["jax_plate"] = pkg
    sys.modules["jax_plate.Utils"] = utils
    try:
        spec = importlib.util.spec_from_file_location(
            "jax_plate.Material", REF_MATERIAL)
        refmat = importlib.util.module_from_spec(spec)
        sys.modules["jax_plate.Material"] = refmat
        spec.loader.exec_module(refmat)
        ref_m = refmat.get_material(RHO, "isotropic", E=E, G=G, beta=BETA)
        theta = np.asarray([E, G, BETA])
        ref = [np.asarray(x) for x in ref_m.get_ABD_transform(H)(theta, 0.0)]
        ours = [np.asarray(x) for x in mat.get_ABD_transform(H)(theta, 0.0)]
        for r, o in zip(ref, ours):
            np.testing.assert_array_equal(r, o)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_static_limit_unit_response(acc, mat):
    """Base-driven FRF -> 1 as omega -> 0 (exact physical invariant shared
    with the reference model)."""
    p = _symm(acc, mat, ny=2)
    fr = np.abs(np.asarray(p.solveForward(np.array([0.5, 1.0, 2.0]))))
    np.testing.assert_allclose(fr, 1.0, atol=3e-4)
    # and the tail is the O(omega^2) resonance pull, i.e. ordered
    assert fr[0] < fr[1] < fr[2]


def test_expansion_matches_solver(acc, mat):
    """The mode-acceleration expansion (the study's instrument) reproduces
    the actual solver to its truncation tail."""
    p = _symm(acc, mat, ny=2)
    freqs = np.linspace(40, 600, 50)
    fr = np.abs(np.asarray(p.solveForward(freqs)))
    exp = modal_frf_expansion(p, 600.0, n_modes_min=48)
    fre = frf_from_expansion(exp, freqs)
    np.testing.assert_allclose(fre, fr, rtol=5e-6)


def test_resonance_convergence_and_bracket(acc, mat):
    """f0 converges O(h^2) from below (Morley) and the independent Ritz
    upper bound brackets it from above within ~0.5%."""
    f = {}
    for ny in (2, 4, 8):
        exp = modal_frf_expansion(_symm(acc, mat, ny), 600.0, n_modes_min=12)
        f[ny] = float(np.sqrt(exp["lam"][0]) / (2 * np.pi))
    f_star, _, _ = richardson([f[2]], [f[4]], [f[8]])
    # recorded continuum value (study: 152.98 from the ny=3/6/12 family)
    assert abs(f_star[0] - 152.98) / 152.98 < 2e-3
    fr_upper = clamped_strip_frequencies(
        100e-3, 20e-3, H, E, NU, RHO, accel=acc, accel_pos=(10e-3, 0.0),
        n_x=24, n_y=8, n_modes=1)[0]
    assert f_star[0] < fr_upper            # Ritz bounds from above
    assert fr_upper - f_star[0] < 0.008 * f_star[0]


def test_reference_golden_inside_resonance_error_band(acc, mat):
    """The reference's 341.9363 lies inside the checksum interval spanned
    when the single in-band resonance moves within the reference mesh's
    own error bar (+-1%; its implied shift is +0.7..0.9%), while every
    converged discretization sits near 145."""
    p = _symm(acc, mat, ny=4)
    exp = modal_frf_expansion(p, 600.0, n_modes_min=48)
    freqs = np.linspace(40, 600, 50)
    ours = float(frf_from_expansion(exp, freqs).sum())
    assert abs(ours - 147.0) < 6.0          # converged neighborhood
    lo, hi = checksum_interval(exp, freqs, [0.01], slack=1.0,
                               n_samples=800)
    assert lo < 341.9363 < hi


def test_shi_resolved_peak_checksum_converged(acc, mat):
    """cpu_benchmark's 3000-pt checksum is a converged observable here:
    ny=2 and ny=4 agree to <0.5% (recorded limit 9405; the reference's
    committed 8416.44 reflects its own coarse-mesh amplitude bias)."""
    vals = []
    for ny in (2, 4):
        geom = pip.Geometry(
            "sh_i", acc, pip.GeometryParams(99.9e-3, 20e-3, H, None, None),
            ny=ny)
        p = pip.Problem(geom, mat, acc)
        exp = modal_frf_expansion(p, 600.0, n_modes_min=48)
        vals.append(float(
            frf_from_expansion(exp, np.linspace(40, 600, 3000)).sum()))
    assert abs(vals[1] - vals[0]) / vals[0] < 5e-3
    assert abs(vals[1] - 9405.0) / 9405.0 < 2e-2
