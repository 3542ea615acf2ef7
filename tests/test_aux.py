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
