"""FEM element and assembly correctness against analytic oracles."""
import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

import plate_inverse_problem_tpu.fem.assembly as asm
from plate_inverse_problem_tpu.fem.morley import build_morley, morley_point_eval
from plate_inverse_problem_tpu.fem.p1 import build_p1
from plate_inverse_problem_tpu.mesh.generators import structured_rectangle
from plate_inverse_problem_tpu.mesh.locate import locate_points
from plate_inverse_problem_tpu.ops.scatter import to_dense


def _dense(pattern, flat):
    return np.asarray(to_dense(jnp.asarray(flat), pattern.rows, pattern.cols, pattern.n))


def _bending_system(mesh, nu=0.3, ss=True):
    """Assemble isotropic bending K, M with w=0 vertex BC (simply supported)
    or full clamp on all boundary."""
    md = build_morley(mesh)
    elem = asm._morley_element_matrices(md)
    b = asm._COOBuilder(md["n_dofs"])
    for nm, vals in elem.items():
        b.add(nm, md["dofs"], md["dofs"], vals)
    pattern, mats = b.finalize()

    V = mesh.num_nodes
    onb = np.zeros(md["n_dofs"], bool)
    bedges = mesh.boundary_edges()
    bverts = np.unique(mesh.edges[bedges].ravel())
    onb[bverts] = True
    if not ss:
        onb[V + bedges] = True
    rp, rm, lifts, free = asm.reduce_dirichlet(pattern, mats, onb, np.zeros(md["n_dofs"]))
    Dv = np.array([1.0, nu, 0, 1.0, 0, (1 - nu) / 2])
    Kf = sum(Dv[i] * rm[nm] for i, nm in enumerate(
        ["K11", "K12", "K16", "K22", "K26", "K66"]))
    return rp, Kf, rm["M"], md, free


def test_morley_interpolates_quadratics_exactly():
    """The Morley basis must reproduce any quadratic from its DOFs."""
    mesh = structured_rectangle(1.0, 1.0, 3, 3)
    md = build_morley(mesh)

    def f(x, y):
        return 1.0 + 2 * x - 3 * y + 0.5 * x * x + 1.5 * x * y - 0.7 * y * y

    def grad_f(x, y):
        return np.array([2 + x + 1.5 * y, -3 + 1.5 * x - 1.4 * y])

    V = mesh.num_nodes
    dofs = np.zeros(md["n_dofs"])
    dofs[:V] = f(mesh.nodes[:, 0], mesh.nodes[:, 1])
    ea, eb = mesh.nodes[mesh.edges[:, 0]], mesh.nodes[mesh.edges[:, 1]]
    mid = 0.5 * (ea + eb)
    t = eb - ea
    n = np.stack([t[:, 1], -t[:, 0]], 1) / np.linalg.norm(t, axis=1)[:, None]
    for e in range(mesh.num_edges):
        dofs[V + e] = grad_f(*mid[e]) @ n[e]

    pts = np.array([[0.37, 0.21], [0.5, 0.5], [0.8, 0.93]])
    tri, _ = locate_points(mesh, pts)
    vals, grads = morley_point_eval(md, tri, pts)
    for p in range(3):
        ld = md["dofs"][tri[p]]
        got = vals[p] @ dofs[ld]
        np.testing.assert_allclose(got, f(*pts[p]), rtol=1e-10)
        got_g = grads[p].T @ dofs[ld]
        np.testing.assert_allclose(got_g, grad_f(*pts[p]), rtol=1e-9)


def test_morley_constant_curvature_energy():
    """Patch test: for w = x^2/2 the bending energy integral over any mesh
    must be exact: int wxx^2 = area."""
    mesh = structured_rectangle(2.0, 1.0, 5, 3)
    md = build_morley(mesh)
    V = mesh.num_nodes
    dofs = np.zeros(md["n_dofs"])
    dofs[:V] = 0.5 * mesh.nodes[:, 0] ** 2
    ea, eb = mesh.nodes[mesh.edges[:, 0]], mesh.nodes[mesh.edges[:, 1]]
    mid = 0.5 * (ea + eb)
    t = eb - ea
    n = np.stack([t[:, 1], -t[:, 0]], 1) / np.linalg.norm(t, axis=1)[:, None]
    dofs[V:] = mid[:, 0] * n[:, 0]  # d/dn of x^2/2 = x*nx

    elem = asm._morley_element_matrices(md)
    b = asm._COOBuilder(md["n_dofs"])
    b.add("K11", md["dofs"], md["dofs"], elem["K11"])
    pattern, mats = b.finalize()
    K11 = _dense(pattern, mats["K11"])
    energy = dofs @ K11 @ dofs  # = int (wxx)^2 = 1 * area
    np.testing.assert_allclose(energy, 2.0, rtol=1e-10)


def test_mass_matrix_total():
    mesh = structured_rectangle(2.0, 1.0, 4, 4)
    md = build_morley(mesh)
    elem = asm._morley_element_matrices(md)
    b = asm._COOBuilder(md["n_dofs"])
    b.add("M", md["dofs"], md["dofs"], elem["M"])
    pattern, mats = b.finalize()
    M = _dense(pattern, mats["M"])
    V = mesh.num_nodes
    ones = np.zeros(md["n_dofs"])
    ones[:V] = 1.0  # w == 1 has zero normal derivatives
    np.testing.assert_allclose(ones @ M @ ones, 2.0, rtol=1e-10)


def test_ss_plate_eigenvalues_converge():
    """Simply supported unit square, D=1: lam_mn = pi^4 (m^2+n^2)^2."""
    errs = []
    for n in (8, 16):
        rp, Kf, Mf, _, _ = _bending_system(structured_rectangle(1.0, 1.0, n, n))
        K = _dense(rp, Kf)
        M = _dense(rp, Mf)
        lam = sla.eigh(K, M, eigvals_only=True, subset_by_index=[0, 0])[0]
        errs.append(abs(lam - np.pi**4 * 4) / (np.pi**4 * 4))
    assert errs[1] < errs[0] / 3.0  # ~O(h^2)
    assert errs[1] < 0.03


def test_clamped_plate_eigenvalue():
    """Fully clamped unit square: lambda_1 = 1294.934 (Leissa) for D=1,
    rho h=1.  Morley converges from below with a large constant for clamped
    BCs, so check the Richardson-extrapolated O(h^2) limit."""
    lams = []
    for n in (8, 16):
        rp, Kf, Mf, _, _ = _bending_system(
            structured_rectangle(1.0, 1.0, n, n), ss=False
        )
        K = _dense(rp, Kf)
        M = _dense(rp, Mf)
        lams.append(sla.eigh(K, M, eigvals_only=True, subset_by_index=[0, 0])[0])
    richardson = (4 * lams[1] - lams[0]) / 3
    np.testing.assert_allclose(richardson, 1294.934, rtol=0.03)
    assert lams[0] < lams[1] < 1294.934  # monotone from below


def test_p1_laplace_patch():
    """P1 gradients integrate a linear field exactly."""
    mesh = structured_rectangle(2.0, 1.0, 3, 3)
    pd = build_p1(mesh)
    u = 2.0 * mesh.nodes[:, 0] + 3.0 * mesh.nodes[:, 1]
    # energy int |grad u|^2 = (4+9)*area
    S = np.zeros((mesh.num_nodes, mesh.num_nodes))
    g = pd["grad"]
    for t in range(mesh.num_triangles):
        d = pd["dofs"][t]
        S[np.ix_(d, d)] += pd["area"][t] * (g[t] @ g[t].T)
    np.testing.assert_allclose(u @ S @ u, 13.0 * 2.0, rtol=1e-12)


def test_bc_lift_matches_dense_reduction():
    """The sparse Dirichlet lift equals the dense free/constrained formula
    (pyFFInterface.py:106-118)."""
    mesh = structured_rectangle(1.0, 1.0, 4, 4)
    md = build_morley(mesh)
    elem = asm._morley_element_matrices(md)
    b = asm._COOBuilder(md["n_dofs"])
    b.add("K11", md["dofs"], md["dofs"], elem["K11"])
    pattern, mats = b.finalize()
    Kfull = _dense(pattern, mats["K11"])

    n = md["n_dofs"]
    constrained = np.zeros(n, bool)
    constrained[: mesh.num_nodes] = mesh.nodes[:, 0] < 1e-12
    g = np.zeros(n)
    g[constrained] = 1.0

    rp, rm, lifts, free = asm.reduce_dirichlet(pattern, mats, constrained, g)
    K_red = _dense(rp, rm["K11"])
    np.testing.assert_allclose(K_red, Kfull[np.ix_(free, free)], atol=1e-12)
    expect_lift = -(Kfull[np.ix_(free, np.nonzero(constrained)[0])] @ g[constrained])
    np.testing.assert_allclose(lifts["K11"], expect_lift, atol=1e-12)


def test_symm_operator_symmetry():
    from plate_inverse_problem_tpu.mesh import generate_plate_mesh

    mesh = generate_plate_mesh("symm", 100e-3, 20e-3, 4e-3, accel_x=10e-3, ny=2)
    op = asm.assemble_symm(mesh, (10e-3, 0.0),
                           indicator=asm.accel_indicator(10e-3, 0.0, 4e-3))
    for i in range(6):
        Kd = _dense(op.pattern, op.Ks[i])
        assert np.abs(Kd - Kd.T).max() < 1e-8 * max(np.abs(Kd).max(), 1e-30)
    Md = _dense(op.pattern, op.M)
    assert np.abs(Md - Md.T).max() < 1e-12 * np.abs(Md).max()
    # indicator-weighted mass is a fraction of total
    MC = _dense(op.pattern, op.MCorrection)
    assert 0 < np.trace(MC) < np.trace(Md)


def test_unsymm_operator_symmetry():
    from plate_inverse_problem_tpu.mesh import generate_plate_mesh

    mesh = generate_plate_mesh("symm", 100e-3, 20e-3, 4e-3, accel_x=10e-3, ny=2)
    op = asm.assemble_unsymm(mesh, (10e-3, 0.0), 4e-3,
                             indicator=asm.accel_indicator(10e-3, 0.0, 4e-3))
    for name, flat in op.mats.items():
        Ad = _dense(op.pattern, flat)
        scale = max(np.abs(Ad).max(), 1e-30)
        assert np.abs(Ad - Ad.T).max() < 1e-8 * scale, name
