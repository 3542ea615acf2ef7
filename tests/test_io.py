"""IO subsystem: compressor, report/log writers, accelerometer catalog."""
import numpy as np
import pytest

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.io.compress import Compressor
from plate_inverse_problem_tpu.io.report import write_report, write_log
from plate_inverse_problem_tpu.optimize import optResult


def _synthetic_fr(n=600):
    """Sharp-peaked magnitude curve like an FRF (Input.py:161-184 self-demo)."""
    f = np.linspace(40, 1200, n)
    y = np.ones(n) * 0.01
    for pk, w in [(200, 12.0), (450, 15.0), (800, 20.0)]:
        y = y + 1.0 / (1 + ((f - pk) / w) ** 2)
    return f, y.astype(complex)


def test_compressor_alg0_uniform():
    f, y = _synthetic_fr()
    c = Compressor(f, y, 600, 0)
    f2, y2 = c(100)
    assert f2.size <= 100
    assert f2.size >= 99
    # roughly uniform spacing
    d = np.diff(f2)
    assert d.max() < 3 * d.min() + 1e-9


def test_compressor_alg1_keeps_peaks():
    f, y = _synthetic_fr()
    c = Compressor(f, y, 600, 1)
    f2, y2 = c(150)
    assert f2.size <= 150
    # every true peak is represented within a few Hz
    for pk in (200, 450, 800):
        assert np.min(np.abs(f2 - pk)) < 10.0


def test_compressor_rejects_oversize():
    f, y = _synthetic_fr(100)
    c = Compressor(f, y, 100, 0)
    with pytest.raises(ValueError):
        c(101)


def test_report_and_log(tmp_path):
    res = optResult(
        x=np.array([1.0, 2.0]), f=0.5, f_history=[1.0, 0.7],
        x_history=[np.zeros(2), np.ones(2)], grad_history=[np.ones(2)] * 2,
        niter=2, status="Converged",
    )
    p1 = write_report("case_x", "hello report\n", out_dir=str(tmp_path))
    p2 = write_log("case_x", res, out_dir=str(tmp_path))
    assert open(p1).read() == "hello report\n"
    dat = np.load(p2)
    assert dat["x"].shape == (3, 2)
    assert dat["f"].shape == (3,)
    assert dat["k"][0] == 2


def test_accelerometer_catalog_roundtrip(tmp_path, monkeypatch):
    a = pip.Accelerometer("AP1030")
    assert a.mass == 0.0017
    assert a.radius == 0.0038
    params = pip.AccelerometerParams(0.001, 0.003, 0.005, 0.5, 0.01)
    a2 = pip.Accelerometer(params)
    assert a2.height == 0.005
    with pytest.raises(ValueError):
        pip.Accelerometer("NOPE_MISSING")


def test_geometry_edp_parsing(tmp_path):
    """Parameter read-back from a FreeFEM .edp template (the reverse of the
    reference's regex substitution, Geometry.py:191-222)."""
    edp = tmp_path / "custom.edp"
    edp.write_text(
        "real Lx = 99.9*1e-3;\nreal Ly = 20*1e-3;\nreal rAccel = 3.8e-3;\n"
        "real offsetAccelX = rAccel;\nreal offsetAccelY = Ly/2 - rAccel;\n"
    )
    g = pip.Geometry(str(edp), height=2e-3)
    np.testing.assert_allclose(g.length, 99.9e-3)
    np.testing.assert_allclose(g.accel_y, 20e-3 / 2 - 3.8e-3)
