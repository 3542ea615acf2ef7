"""Reference-API compatibility layer."""
import numpy as np


def test_compat_surface():
    import plate_inverse_problem_tpu.compat as jp

    acc = jp.Accelerometer.Accelerometer("AP1030")
    geom = jp.Geometry.Geometry(
        "symm", acc, jp.Geometry.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
        ny=1,
    )
    mat = jp.Material.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    p = jp.Problem.Problem(geom, mat, acc)
    fr = p.solveForward(np.linspace(40, 100, 3))
    assert np.all(np.isfinite(np.asarray(fr)))
    assert hasattr(jp.Optimizers, "optimize_trust_region")
    assert hasattr(jp.Input, "Compressor")
    assert hasattr(jp.Utils, "plot_fr")
    assert hasattr(jp.Sparse, "sweep_solve")
