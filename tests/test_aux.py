"""Aux subsystems: checkpoint/resume, numerical guards, mesh refinement."""
import numpy as np
import jax.numpy as jnp
import pytest

from plate_inverse_problem_tpu.io.checkpoint import (
    save_checkpoint, load_checkpoint, checkpointed_optimize,
)
from plate_inverse_problem_tpu.diagnostics.checks import nan_guard, checked, assert_finite
from plate_inverse_problem_tpu.mesh.generators import structured_rectangle, refine_uniform
from plate_inverse_problem_tpu.optimize import optimize_gd


def test_checkpoint_roundtrip(tmp_path):
    st = {"x": np.array([1.0, 2.0]), "done": 7, "status": "Running",
          "x_history": [np.zeros(2), np.ones(2)]}
    p = save_checkpoint(str(tmp_path / "ck"), st)
    st2 = load_checkpoint(p)
    np.testing.assert_allclose(st2["x"], st["x"])
    assert st2["done"] == 7
    assert st2["status"] == "Running"
    assert len(st2["x_history"]) == 2


def test_checkpointed_optimize_resumes(tmp_path):
    m = np.array([0.7, -1.3])

    def quad(x):
        d = x - jnp.asarray(m)
        return 0.5 * d @ d

    ck = str(tmp_path / "opt_ck")
    r1 = checkpointed_optimize(optimize_gd, quad, jnp.zeros(2),
                               checkpoint_path=ck, checkpoint_every=3,
                               N_steps=6, h=0.3)
    assert r1.niter == 6
    # resume continues from saved state
    r2 = checkpointed_optimize(optimize_gd, quad, jnp.zeros(2),
                               checkpoint_path=ck, checkpoint_every=3,
                               N_steps=12, h=0.3)
    assert r2.niter == 12
    assert len(r2.f_history) >= len(r1.f_history)
    np.testing.assert_allclose(np.asarray(r2.x), m, atol=5e-2)


def test_nan_guard():
    ok = nan_guard(lambda x: x * 2)
    np.testing.assert_allclose(ok(jnp.ones(3)), 2.0)
    bad = nan_guard(lambda x: x / 0.0)
    with pytest.raises(FloatingPointError):
        bad(jnp.ones(3))


def test_checkify_guard():
    g = assert_finite("loss")

    def f(x):
        return jnp.sum(g(jnp.log(x)))

    err, out = checked(f)(jnp.asarray([1.0, 2.0]))
    err.throw()  # no error
    err, out = checked(f)(jnp.asarray([-1.0, 2.0]))
    with pytest.raises(Exception):
        err.throw()


def test_refine_uniform():
    m = structured_rectangle(1.0, 1.0, 2, 2)
    m.label_boundary(lambda x, y: np.abs(x - 1.0) < 1e-12, label=1)
    r = refine_uniform(m, 1)
    assert r.num_triangles == 4 * m.num_triangles
    np.testing.assert_allclose(r.areas().sum(), 1.0, rtol=1e-12)
    # labels survive
    assert (r.edge_labels == 1).sum() == 2 * (m.edge_labels == 1).sum()


def test_oracle_check_both_paths():
    """diagnostics.oracle audits an engine sweep against f64 splu — the
    user-facing convergence signal for the iterative engines (the FGMRES
    solve inside custom_linear_solve cannot expose one directly)."""
    import plate_inverse_problem_tpu as pip
    from plate_inverse_problem_tpu.diagnostics import oracle_check

    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    acc = pip.Accelerometer("AP1030")
    freqs = np.linspace(60.0, 400.0, 9)

    # 3-field accelerometer path
    geom = pip.Geometry("symm", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
                        ny=1)
    p = pip.Problem(geom, mat, acc)
    rep = oracle_check(p, freqs)
    assert rep["worst_rel_err"] < 1e-6, rep
    assert rep["at_hz"] in rep["checked_hz"]

    # pure-bending symmetric path (complex interpolation readout)
    geom2 = pip.Geometry("symm", acc,
                         pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
                         ny=1)
    p2 = pip.Problem(geom2, mat, None)
    rep2 = oracle_check(p2, freqs, n_points=3)
    assert rep2["worst_rel_err"] < 1e-6, rep2
