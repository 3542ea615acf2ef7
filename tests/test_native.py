"""Native C host-runtime kernels vs numpy fallbacks."""
import numpy as np

from plate_inverse_problem_tpu import native
from plate_inverse_problem_tpu.mesh.generators import structured_rectangle


def test_native_builds():
    assert native.available(), "C toolchain present in CI image; lib must build"


def test_smoke_matches_numpy():
    x = np.random.default_rng(0).standard_normal(10000)
    y = native.smoke(x)
    np.testing.assert_allclose(y, 2 * x + np.sin(x), rtol=1e-15)


def test_coo_accumulate_matches_add_at():
    rng = np.random.default_rng(1)
    slots = rng.integers(0, 100, 5000)
    vals = rng.standard_normal(5000)
    out_ref = np.zeros(100)
    np.add.at(out_ref, slots, vals)
    out = native.coo_accumulate(slots, vals, 100)
    np.testing.assert_allclose(out, out_ref, rtol=1e-12)


def test_locate_points_matches_numpy_fallback():
    mesh = structured_rectangle(2.0, 1.0, 13, 7)
    rng = np.random.default_rng(2)
    pts = np.stack([rng.uniform(0, 2, 200), rng.uniform(0, 1, 200)], axis=1)

    tri_n, bary_n = native.locate_points(mesh.nodes, mesh.triangles, pts)
    # reconstruct each point from its barycentric coordinates
    rec = np.einsum("pi,pid->pd", bary_n, mesh.nodes[mesh.triangles[tri_n]])
    np.testing.assert_allclose(rec, pts, atol=1e-10)


def test_locate_points_outside_snaps():
    mesh = structured_rectangle(1.0, 1.0, 4, 4)
    tri, bary = native.locate_points(
        mesh.nodes, mesh.triangles, np.array([[1.5, 0.5]])
    )
    assert 0 <= tri[0] < mesh.num_triangles
    np.testing.assert_allclose(bary.sum(axis=1), 1.0)
    assert np.all(bary >= 0)
