"""Unstructured meshing: border-loop Delaunay domains, holes, .edp import
(the reference's arbitrary-buildmesh capability, Geometry.py:115-145)."""
import os

import numpy as np
import pytest

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.mesh.delaunay import border, build_mesh, chain
from plate_inverse_problem_tpu.mesh.edp import mesh_from_edp, parse_edp_geometry

REF_GEO = "/root/reference/source/jax_plate/geometry"

EDP_SNIPPET = """
real Lx = 80e-3;
real Ly = 40e-3;
real r = 8e-3;
int n = 10;
border Bl(t=0., 1){x=0; y=Ly - t*Ly; label=0;}
border Bb(t=0., 1){x=Lx*t; y=0; label=0;}
border Br(t=0., 1){x=Lx; y=t*Ly; label=1;}
border Bt(t=0., 1){x=(1-t)*Lx; y=Ly; label=0;}
border Hole(t=0., 2*pi){x=Lx/2 + r*cos(-t); y=Ly/2 + r*sin(-t); label=0;}
mesh Th = buildmesh(Bl(n) + Bb(2*n) + Br(n) + Bt(2*n) + Hole(n));
"""


def _rect_with_hole(scale: int):
    Lx, Ly, r = 80e-3, 40e-3, 8e-3
    loop = chain(
        border(lambda t: (0 * t, Ly / 2 - t * Ly), 0, 1, 10 * scale),
        border(lambda t: (Lx * t, -Ly / 2 + 0 * t), 0, 1, 20 * scale),
        border(lambda t: (Lx + 0 * t, -Ly / 2 + t * Ly), 0, 1, 10 * scale,
               label=1),
        border(lambda t: ((1 - t) * Lx, Ly / 2 + 0 * t), 0, 1, 20 * scale),
    )
    hole = border(lambda t: (Lx / 2 + r * np.cos(-t), r * np.sin(-t)),
                  0, 2 * np.pi, 12 * scale)
    return build_mesh([loop, hole], smooth=3)


def test_hole_domain_mesh_is_sound():
    m = _rect_with_hole(1)
    assert m.num_triangles > 100
    assert m.areas().min() > 0
    assert (m.edge_labels == 1).sum() == 10          # clamped side intact
    # no triangle inside the hole
    cen = m.nodes[m.triangles].mean(axis=1)
    d = np.hypot(cen[:, 0] - 40e-3, cen[:, 1])
    assert (d < 7.5e-3).sum() == 0
    # hole boundary honored: ring of edges at radius r
    assert (np.hypot(*m.nodes.T - np.array([[40e-3], [0.0]])) < 8.01e-3).sum() >= 12


def test_hole_domain_solves_and_converges():
    """Mesh + solve a clamped plate with an interior hole; the fundamental
    frequency is mesh-converged to ~0.5% between two densities (the
    convergence-sanity gate for arbitrary domains)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    f0s = []
    for scale in (1, 2):
        m = _rect_with_hole(scale)
        geom = pip.Geometry(
            "symm", pip.Accelerometer("AP1030"),
            pip.GeometryParams(80e-3, 40e-3, 2e-3, 20e-3, None))
        geom._mesh = m
        p = pip.Problem(geom, mat, None)      # symmetric bending path
        _, od = p.getFRCore()
        n = p.n_free
        rows, cols = np.asarray(od["rows"]), np.asarray(od["cols"])
        import jax
        with jax.default_device(jax.devices("cpu")[0]):
            D = np.asarray(mat.get_D_transform(2e-3)(
                np.asarray(p.parameters), 0.0))
        Kf = np.einsum("k,kn->n", D.real, np.asarray(od["Ks"]))
        K = sp.csc_matrix((Kf, (rows, cols)), shape=(n, n))
        M = sp.csc_matrix((np.asarray(od["MIn"]), (rows, cols)), shape=(n, n))
        lam = spla.eigsh(0.5 * (K + K.T), k=1, M=0.5 * (M + M.T),
                         sigma=0, which="LM", return_eigenvectors=False)
        f0s.append(float(np.sqrt(lam[0]) / (2 * np.pi)))
    assert abs(f0s[1] - f0s[0]) / f0s[1] < 7e-3, f0s


def test_edp_snippet_parse_and_mesh():
    params, borders, calls = parse_edp_geometry(EDP_SNIPPET)
    assert params["Lx"] == pytest.approx(80e-3)
    assert borders["Br"]["label"] == 1
    assert [c[0] for c in calls] == ["Bl", "Bb", "Br", "Bt", "Hole"]
    m = mesh_from_edp(EDP_SNIPPET)
    assert m.num_triangles > 100
    # the CW hole is empty
    cen = m.nodes[m.triangles].mean(axis=1)
    assert (np.hypot(cen[:, 0] - 40e-3, cen[:, 1] - 20e-3) < 7.5e-3).sum() == 0
    assert (m.edge_labels == 1).sum() == 10


def test_edp_custom_dirichlet_labels(tmp_path):
    """A user .edp that clamps labels other than 1 through its own on(...)
    clauses is honored: the essential BC follows the script's label set
    (the reference hands this to FreeFEM's varf machinery; here
    mesh/edp.parse_dirichlet_labels feeds the assembly)."""
    from plate_inverse_problem_tpu.mesh.edp import parse_dirichlet_labels

    assert parse_dirichlet_labels("on(2, 3, u=0, ux=0);") == (2, 3)
    assert parse_dirichlet_labels("on(C, u=0);") == ()
    assert parse_dirichlet_labels("x = y + 1;") == ()

    def script(clamp_label, with_on):
        s = f"""
real Lx = 100e-3; real Ly = 20e-3;
real xtest = 30e-3; real ytest = 0.0;
int n = 6;
border Bl(t=0., 1){{x=0; y=Ly/2 - t*Ly; label=0;}}
border Bb(t=0., 1){{x=Lx*t; y=-Ly/2; label=0;}}
border Br(t=0., 1){{x=Lx; y=-Ly/2 + t*Ly; label={clamp_label};}}
border Bt(t=0., 1){{x=(1-t)*Lx; y=Ly/2; label=0;}}
mesh Th = buildmesh(Bl(n) + Bb(5*n) + Br(n) + Bt(5*n));
"""
        if with_on:
            s += f"problem P(u, v) = ... + on({clamp_label}, u=0, ux=0, uy=0);\n"
        return s

    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

    def frf_of(text):
        fp = tmp_path / "g.edp"
        fp.write_text(text)
        geom = pip.Geometry(str(fp), height=2e-3)
        p = pip.Problem(geom, mat, None)
        return geom, np.asarray(p.getFRFunction()(
            np.array([80.0, 160.0]), np.asarray(p.parameters)))

    g1, y1 = frf_of(script(1, with_on=False))     # default label-1 clamp
    g4, y4 = frf_of(script(4, with_on=True))      # same side, label 4 + on(4)
    assert g1.clamped_labels == (1,)
    assert g4.clamped_labels == (4,)
    assert np.all(np.isfinite(y1)) and np.all(np.abs(y1) > 0)
    # identical domain + identical clamped side -> identical physics
    # (assert_allclose would equate NaNs — finiteness asserted above)
    np.testing.assert_allclose(y4, y1, rtol=1e-9)

    # no accelerometer and no xtest/ytest: loud error, not a NaN FRF
    fp = tmp_path / "g.edp"
    fp.write_text(script(1, with_on=False).replace(
        "real xtest = 30e-3; real ytest = 0.0;", ""))
    gbad = pip.Geometry(str(fp), height=2e-3)
    with pytest.raises(ValueError, match="test point"):
        pip.Problem(gbad, mat, None)

    # explicit kwarg overrides the script
    fp = tmp_path / "g.edp"
    fp.write_text(script(4, with_on=False))
    g = pip.Geometry(str(fp), height=2e-3, clamped_labels=(4,))
    assert g.clamped_labels == (4,)


def test_edp_fe_statements_warn_loudly(tmp_path):
    """A user .edp containing varf/fespace/solve sections gets a
    RuntimeWarning naming what the geometry interpreter skipped (the
    reference executes the whole script via FreeFEM, FreeFemIO.py:247-334;
    silence here would be a user trap)."""
    import warnings as _warnings

    from plate_inverse_problem_tpu.mesh.edp import warn_ignored_fe_statements

    geo = """
real Lx = 50e-3; real Ly = 20e-3;
real xtest = 10e-3; real ytest = 0.0;
border Bl(t=0., 1){x=0; y=Ly/2 - t*Ly; label=0;}
border Bb(t=0., 1){x=Lx*t; y=-Ly/2; label=0;}
border Br(t=0., 1){x=Lx; y=-Ly/2 + t*Ly; label=1;}
border Bt(t=0., 1){x=(1-t)*Lx; y=Ly/2; label=0;}
mesh Th = buildmesh(Bl(4) + Bb(10) + Br(4) + Bt(10));
"""
    fe = geo + """
fespace Vh(Th, P2Morley);
varf K(u, v) = int2d(Th)(dxx(u)*dxx(v)) + on(1, u=0);
solve P(u, v) = int2d(Th)(u*v);
"""
    # pure geometry: no warning
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert warn_ignored_fe_statements(geo) == []

    # FE statements: one warning naming each skipped statement kind
    with pytest.warns(RuntimeWarning, match="fespace.*solve.*varf"):
        found = warn_ignored_fe_statements(fe)
    assert found == ["fespace", "solve", "varf"]

    # commented-out statements do not trigger
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert warn_ignored_fe_statements(
            geo + "// varf K(u, v) = ...;\n/* solve P; */\n") == []

    # the Geometry .edp-loading path surfaces the same warning
    fp = tmp_path / "fe.edp"
    fp.write_text(fe)
    with pytest.warns(RuntimeWarning, match="FE statements"):
        g = pip.Geometry(str(fp), height=2e-3)
    assert g.clamped_labels == (1,)


@pytest.mark.skipif(not os.path.isdir(REF_GEO),
                    reason="reference checkout not available")
def test_reference_edp_scripts_mesh_and_solve():
    """The reference's own geometry scripts import end-to-end: borders ->
    Delaunay mesh -> Geometry -> Problem -> FRF."""
    geom = pip.Geometry(os.path.join(REF_GEO, "symm.edp"), height=2e-3)
    m = geom.get_mesh()
    assert m.num_triangles > 500
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    acc = pip.Accelerometer("AP1030")
    geom2 = pip.Geometry(os.path.join(REF_GEO, "symm.edp"), acc, height=2e-3)
    p = pip.Problem(geom2, mat, acc)
    y = np.asarray(p.getFRFunction()(np.array([100.0, 200.0]),
                                     np.asarray(p.parameters)))
    assert np.all(np.isfinite(y)) and np.all(y > 0)


def test_size_field_grading():
    """build_mesh honors a spatially varying size field (the adaptmesh
    point-distribution machinery): elements near the clamped edge come out
    ~3x smaller than at the far end."""
    Lx, Ly = 100e-3, 20e-3
    loop = chain(
        border(lambda t: (0 * t, Ly / 2 - t * Ly), 0, 1, 8),
        border(lambda t: (Lx * t, -Ly / 2 + 0 * t), 0, 1, 40),
        border(lambda t: (Lx + 0 * t, -Ly / 2 + t * Ly), 0, 1, 8, label=1),
        border(lambda t: ((1 - t) * Lx, Ly / 2 + 0 * t), 0, 1, 40))
    sf = lambda q: 0.5e-3 + 2.5e-3 * (1 - q[:, 0] / Lx)  # noqa: E731
    m = build_mesh([loop], size_field=sf, h_min=0.5e-3, smooth=3)
    el = m.edge_lengths()
    mid = 0.5 * (m.nodes[m.edges[:, 0]] + m.nodes[m.edges[:, 1]])
    near = el[mid[:, 0] > 0.9 * Lx].mean()
    far = el[mid[:, 0] < 0.1 * Lx].mean()
    assert far / near > 2.5
    assert m.areas().min() > 0


def test_adapted_mesh_concentrates_on_solution_feature():
    """adapted_mesh (the adaptmesh counterpart) shrinks elements where the
    recovered second derivative of a nodal field is large."""
    from plate_inverse_problem_tpu.mesh.adapt import adapted_mesh

    Lx, Ly = 100e-3, 20e-3
    loop = chain(
        border(lambda t: (0 * t, Ly / 2 - t * Ly), 0, 1, 10),
        border(lambda t: (Lx * t, -Ly / 2 + 0 * t), 0, 1, 50),
        border(lambda t: (Lx + 0 * t, -Ly / 2 + t * Ly), 0, 1, 10, label=1),
        border(lambda t: ((1 - t) * Lx, Ly / 2 + 0 * t), 0, 1, 50))
    m0 = build_mesh([loop], smooth=3)
    x0, w = 30e-3, 6e-3
    u = np.exp(-((m0.nodes[:, 0] - x0) ** 2 + m0.nodes[:, 1] ** 2) / w ** 2)
    m1 = adapted_mesh([loop], m0, u, rel_err=0.01)
    el = m1.edge_lengths()
    mid = 0.5 * (m1.nodes[m1.edges[:, 0]] + m1.nodes[m1.edges[:, 1]])
    d = np.hypot(mid[:, 0] - x0, mid[:, 1])
    near = el[d < w].mean()
    far = el[(mid[:, 0] > 70e-3)].mean()
    assert far / near > 1.5, (near, far)
    # locally refined at the feature vs the uniform mesh, coarser far away
    el0 = m0.edge_lengths()
    mid0 = 0.5 * (m0.nodes[m0.edges[:, 0]] + m0.nodes[m0.edges[:, 1]])
    near0 = el0[np.hypot(mid0[:, 0] - x0, mid0[:, 1]) < w].mean()
    assert near < near0


def test_edp_power_operator_precedence():
    """FreeFEM's ^ is power with POWER precedence: Lx*Ly^2 must evaluate
    Lx*(Ly**2) and -x^2 must evaluate -(x**2) — an ast.BitXor mapping would
    inherit Python's xor precedence and group (Lx*Ly)**2 silently."""
    from plate_inverse_problem_tpu.mesh.edp import _eval

    env = {"Lx": 3.0, "Ly": 2.0}
    assert _eval("Lx*Ly^2", env) == 12.0
    assert _eval("-Ly^2", env) == -4.0
    assert _eval("Ly^3^2", env) == 2.0 ** 9  # right-associative
    assert _eval("2^-1", env) == 0.5


def test_edp_comments_do_not_leak():
    """Commented-out statements (// and /* */) must not contribute params,
    borders, or Dirichlet labels."""
    from plate_inverse_problem_tpu.mesh.edp import (
        parse_dirichlet_labels, parse_edp_geometry,
    )

    text = """
    real Lx = 0.1;
    // real Lx = 99.0;
    /* real Ly = 77.0; */
    real Ly = 0.02;
    // on(5, u=0, ux=0)
    on(2, w=0);
    """
    params, borders, calls = parse_edp_geometry(text)
    assert params["Lx"] == 0.1 and params["Ly"] == 0.02
    assert parse_dirichlet_labels(text) == (2,)
