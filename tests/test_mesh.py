"""Mesh generation, topology and IO."""
import numpy as np

from plate_inverse_problem_tpu.mesh import (
    TriangleMesh, generate_plate_mesh, load_msh, save_msh, locate_points,
)
from plate_inverse_problem_tpu.mesh.generators import structured_rectangle


def test_structured_rectangle_basic():
    m = structured_rectangle(2.0, 1.0, 4, 2)
    assert m.num_nodes == 15
    assert m.num_triangles == 16
    np.testing.assert_allclose(m.areas().sum(), 2.0, rtol=1e-12)
    # Euler: V - E + T = 1 for a disk
    assert m.num_nodes - m.num_edges + m.num_triangles == 1


def test_edge_signs_consistency():
    """Interior edges are shared by exactly two triangles with opposite
    outward normals -> opposite signs against the global orientation."""
    m = structured_rectangle(1.0, 1.0, 3, 3)
    seen = {}
    for t in range(m.num_triangles):
        for i in range(3):
            e = int(m.tri_edges[t, i])
            seen.setdefault(e, []).append(int(m.tri_edge_signs[t, i]))
    for e, signs in seen.items():
        if len(signs) == 2:
            assert signs[0] == -signs[1]
        else:
            assert len(signs) == 1 and m.boundary_edge_mask[e]


def test_template_meshes():
    for tpl, kwargs, r in [
        ("symm", dict(accel_x=10e-3), 4e-3),
        ("sh_i", {}, 3.8e-3),
        ("sh_r", dict(accel_x=20e-3, accel_y=2e-3), 4e-3),
    ]:
        m = generate_plate_mesh(tpl, 100e-3, 20e-3, r, **kwargs)
        np.testing.assert_allclose(m.areas().sum(), 100e-3 * 20e-3, rtol=1e-9)
        assert (m.edge_labels == 1).sum() > 0, tpl
        assert m.quality().min() > 0.1, tpl
        # clamped edges are on x == Lx
        for ei in np.nonzero(m.edge_labels == 1)[0]:
            assert np.allclose(m.nodes[m.edges[ei], 0], 100e-3)


def test_refine_increases_resolution():
    m1 = generate_plate_mesh("symm", 100e-3, 20e-3, 4e-3, accel_x=10e-3)
    m2 = generate_plate_mesh("symm", 100e-3, 20e-3, 4e-3, accel_x=10e-3, refine=2.0)
    assert m2.num_nodes > 2 * m1.num_nodes


def test_msh_roundtrip(tmp_path):
    m = generate_plate_mesh("symm", 100e-3, 20e-3, 4e-3, accel_x=10e-3)
    path = str(tmp_path / "plate.msh")
    save_msh(m, path)
    m2 = load_msh(path)
    np.testing.assert_allclose(m.nodes, m2.nodes)
    np.testing.assert_array_equal(np.sort(m.triangles, 1), np.sort(m2.triangles, 1))
    assert (m2.edge_labels == 1).sum() == (m.edge_labels == 1).sum()


def test_locate_points():
    m = structured_rectangle(1.0, 1.0, 4, 4)
    pts = np.array([[0.1, 0.1], [0.9, 0.55], [0.5, 0.5]])
    tri, bary = locate_points(m, pts)
    np.testing.assert_allclose(bary.sum(axis=1), 1.0)
    # reconstruct point from barycentric coords
    rec = np.einsum("pi,pid->pd", bary, m.nodes[m.triangles[tri]])
    np.testing.assert_allclose(rec, pts, atol=1e-12)


def test_save_vtu(tmp_path):
    from plate_inverse_problem_tpu.mesh import save_vtu

    m = structured_rectangle(1.0, 1.0, 2, 2)
    path = str(tmp_path / "mesh.vtu")
    save_vtu(m, path, point_data={"w": np.arange(m.num_nodes, dtype=float)})
    txt = open(path).read()
    assert txt.count("DataArray") >= 8
    assert 'Name="w"' in txt
    assert f'NumberOfPoints="{m.num_nodes}"' in txt


def test_geometry_export_vtk(tmp_path, monkeypatch):
    import plate_inverse_problem_tpu as pip
    import os

    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
        ny=1, export_vtk=True,
    )
    geom.get_mesh()
    from plate_inverse_problem_tpu.utils.paths import get_package_dir

    out = os.path.join(get_package_dir(), "geometry", "export.vtu")
    assert os.path.exists(out)
    os.remove(out)
