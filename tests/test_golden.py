"""Golden-value regression (the framework's analog of the reference's
examples/basics.py checksums, basics.py:30-33).

The reference's constants (341.9363 etc.) are tied to FreeFEM's exact mesh;
these are OUR deterministic constants for the same physics on our mesher
(ny=2 'symm' template, 100 x 20 x 2 mm steel strip, AP1030).  Any change in
mesher, element kernels, assembly, BC handling, readout or solver that moves
the FRF shows up here.
"""
import numpy as np
import pytest

import plate_inverse_problem_tpu as pip

GOLDEN_UNSYMM_FR_SUM = 131.8992839383
GOLDEN_SYMM_FR_SUM = 170.4095050154
GOLDEN_PERTURBED_SUM = 98.7091285291


@pytest.fixture(scope="module")
def setup():
    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=2
    )
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    freqs = np.linspace(40, 600, 50)
    return acc, geom, mat, freqs


def test_golden_unsymm(setup):
    acc, geom, mat, freqs = setup
    p = pip.Problem(geom, mat, acc)
    fr = np.asarray(p.solveForward(freqs))
    np.testing.assert_allclose(np.abs(fr).sum(), GOLDEN_UNSYMM_FR_SUM, rtol=1e-8)


def test_golden_symm(setup):
    acc, geom, mat, freqs = setup
    p = pip.Problem(geom, mat, None)
    fr = np.asarray(p.solveForward(freqs))
    np.testing.assert_allclose(np.abs(fr).sum(), GOLDEN_SYMM_FR_SUM, rtol=1e-8)


def test_golden_perturbed(setup):
    acc, geom, mat, freqs = setup
    p = pip.Problem(geom, mat, acc)
    r1 = np.asarray(
        p.solveForward(freqs, (np.array([0.1, 0.1, 0.2]) + 1) * np.asarray(p.parameters))
    )
    np.testing.assert_allclose(np.abs(r1).sum(), GOLDEN_PERTURBED_SUM, rtol=1e-8)
