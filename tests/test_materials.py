"""Material transforms, constraints and persistence.

Oracle values mirror the reference formulas (Material.py:357-885).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plate_inverse_problem_tpu import (
    Isotropic, Orthotropic, OrthotropicD4, SOL, SymmetricalSOL, get_material,
)
from plate_inverse_problem_tpu.models.materials import q_to_abd_matrices


def test_isotropic_d_transform():
    m = get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    h = 2e-3
    D = np.asarray(m.get_D_transform(h)(m.get_parameters(), 0.0))
    nu = 200e9 / (2 * 75e9) - 1.0
    D0 = 200e9 * h**3 / (12 * (1 - nu**2))
    expect = np.array([D0, nu * D0, 0, D0, 0, D0 * (1 - nu) / 2]) * (1 + 0.003j)
    np.testing.assert_allclose(D, expect, rtol=1e-12)


def test_isotropic_abd_consistent_with_d():
    m = Isotropic(7920.0, E=200e9, G=75e9, beta=0.003)
    h = 2e-3
    A, B, D = m.get_ABD_transform(h)(m.get_parameters(), 0.0)
    D2 = m.get_D_transform(h)(m.get_parameters(), 0.0)
    np.testing.assert_allclose(np.asarray(D), np.asarray(D2), rtol=1e-12)
    assert np.all(np.asarray(B) == 0)
    # membrane / bending ratio h^2/12
    np.testing.assert_allclose(np.asarray(D) / np.asarray(A)[0] * 12 / h**2,
                               np.asarray(D) / np.asarray(D)[0], rtol=1e-12)


def test_orthotropic_reduces_to_isotropic():
    E, G, beta = 200e9, 75e9, 0.003
    nu = E / (2 * G) - 1
    iso = Isotropic(7920.0, E=E, G=G, beta=beta)
    orto = Orthotropic(7920.0, E1=E, E2=E, G12=G, nu12=nu, beta=beta)
    h = 2e-3
    Di = np.asarray(iso.get_D_transform(h)(iso.get_parameters(), 0.0))
    Do = np.asarray(orto.get_D_transform(h)(orto.get_parameters(), 0.0))
    np.testing.assert_allclose(Di, Do, rtol=1e-12)


def test_orthotropic_d22_ratio():
    # D22/D11 must equal E2/E1 (classical lamination theory; the reference
    # has the inverted ratio at Material.py:499 — documented deviation)
    m = Orthotropic(1600.0, E1=150e9, E2=9e9, G12=5e9, nu12=0.3, beta=0.01)
    D = np.asarray(m.get_D_transform(1e-3)(m.get_parameters(), 0.0))
    np.testing.assert_allclose((D[3] / D[0]).real, 9e9 / 150e9, rtol=1e-12)


def test_orthotropic_d4_per_modulus_loss():
    m = OrthotropicD4(1600.0, E1=150e9, E2=9e9, G12=5e9, nu12=0.3,
                      b1=0.01, b2=0.02, b3=0.03, b4=0.0)
    assert not m.scalar_loss_factor
    D = np.asarray(m.get_D_transform(1e-3)(m.get_parameters(), 0.0))
    # D66 carries exactly G12's loss factor
    np.testing.assert_allclose(D[5].imag / D[5].real, 0.03, rtol=1e-12)


def test_sol_single_layer_0deg_equals_orthotropic():
    E1, E2, G12, nu12, beta = 150e9, 9e9, 5e9, 0.3, 0.01
    sol = SOL(1600.0, angles=[0.0], E1=E1, E2=E2, G12=G12, nu12=nu12, beta=beta)
    h = 1e-3
    D = np.asarray(sol.get_D_transform(h)(sol.get_parameters(), 0.0))
    den = 1 - E2 / E1 * nu12**2
    Q11, Q12, Q22, Q66 = E1 / den, nu12 * E2 / den, E2 / den, G12
    expect = np.array([Q11, Q12, 0, Q22, 0, Q66]) * h**3 / 12 * (1 + 1j * beta)
    np.testing.assert_allclose(D, expect, rtol=1e-10)


def test_sol_90deg_swaps_11_22():
    sol0 = SOL(1600.0, angles=[0.0], E1=150e9, E2=9e9, G12=5e9, nu12=0.3, beta=0.0)
    sol90 = SOL(1600.0, angles=[90.0], E1=150e9, E2=9e9, G12=5e9, nu12=0.3, beta=0.0)
    h = 1e-3
    D0 = np.asarray(sol0.get_D_transform(h)(sol0.get_parameters(), 0.0))
    D90 = np.asarray(sol90.get_D_transform(h)(sol90.get_parameters(), 0.0))
    np.testing.assert_allclose(D90[0], D0[3], rtol=1e-8)
    np.testing.assert_allclose(D90[3], D0[0], rtol=1e-8)
    np.testing.assert_allclose(D90[1], D0[1], rtol=1e-8, atol=1e-3)


def test_sol_mps_detection():
    assert SOL(1.0, [0, 90, 0], E1=1.0, E2=1.0, G12=1.0, nu12=0.3, beta=0.0).is_mps
    assert not SOL(1.0, [0, 90], E1=1.0, E2=1.0, G12=1.0, nu12=0.3, beta=0.0).is_mps


def test_sol_abd_b_vanishes_for_symmetric_stack():
    sol = SOL(1600.0, angles=[30, -45, -45, 30], E1=150e9, E2=9e9, G12=5e9,
              nu12=0.3, beta=0.01)
    A, B, D = sol.get_ABD_transform(1e-3)(sol.get_parameters(), 0.0)
    assert np.max(np.abs(np.asarray(B))) < 1e-6 * np.max(np.abs(np.asarray(A)))


def test_q_to_abd_total_thickness():
    MA, MB, MD = q_to_abd_matrices(np.array([0.0, 0.0]), 2e-3)
    # for all-zero angles, A = Q*h, D = Q*h^3/12, B = 0
    np.testing.assert_allclose(MA, np.eye(6) * 2e-3, atol=1e-18)
    np.testing.assert_allclose(MD, np.eye(6) * (2e-3) ** 3 / 12, atol=1e-22)
    np.testing.assert_allclose(MB, 0, atol=1e-22)


def test_symm_sol_ties_moduli():
    m = SymmetricalSOL(1600.0, [0, 90, 90, 0], E1=60e9, G12=4e9, nu12=0.05, beta=0.01)
    assert m.E2 == m.E1
    assert m.get_parameters().shape == (4,)


def test_constraints_isotropic():
    assert Isotropic.check_parameters(np.array([200e9, 75e9, 0.003]))
    assert not Isotropic.check_parameters(np.array([200e9, 120e9, 0.003]))  # nu<0
    assert not Isotropic.check_parameters(np.array([-1.0, 75e9, 0.003]))


def test_constraints_orthotropic_nonlinear():
    ok = np.array([150e9, 9e9, 5e9, 0.3, 0.01])
    assert Orthotropic.check_parameters(ok)
    bad = ok.copy()
    bad[3] = 5.0  # nu12 > sqrt(E1/E2)
    assert not Orthotropic.check_parameters(bad)


def test_get_constraints_scipy_objects():
    import scipy.optimize

    cons = Orthotropic.get_constraints()
    assert isinstance(cons, list)
    assert isinstance(cons[0], scipy.optimize.LinearConstraint)
    assert isinstance(cons[1], scipy.optimize.NonlinearConstraint)
    # jac/hess evaluate
    x = np.array([150e9, 9e9, 5e9, 0.3, 0.01])
    j = np.asarray(cons[1].jac(x))
    assert j.shape == (1, 5)


def test_material_factory_roundtrip(tmp_path):
    m = Isotropic(7920.0, E=200e9, G=75e9, beta=0.003)
    d = m.get_save_dict()
    d["atype"] = "isotropic"
    import json

    p = tmp_path / "steel.json"
    p.write_text(json.dumps(d))
    m2 = get_material(str(p))
    np.testing.assert_allclose(
        np.asarray(m.get_parameters()), np.asarray(m2.get_parameters())
    )


def test_material_factory_example():
    m = get_material("Example_material")
    assert m.density == 100
    assert m.E == 102


def test_material_factory_errors():
    with pytest.raises(ValueError):
        get_material(-5.0, "isotropic")
    with pytest.raises(ValueError):
        get_material(100.0, "bogus")
    with pytest.raises(ValueError):
        get_material(100.0, "isotropic", WRONG=1.0)
    with pytest.raises(ValueError):
        get_material(100.0, "sol", E1=1.0)  # missing angles


def _assert_split_matches(m, h):
    """Split (re, im) transforms must agree with the complex transforms at
    f64 for every family (they are the exact-f64 device path — complex128 is
    not a TPU type)."""
    th = np.asarray(m.get_parameters(), np.float64)
    A, B, D = (np.asarray(x) for x in m.get_ABD_transform(h)(th, 100.0))
    (Ar, Ai), (Br, Bi), (Dr, Di) = m.get_ABD_transform_split(h)(th, 100.0)
    np.testing.assert_allclose(np.asarray(Ar) + 1j * np.asarray(Ai), A,
                               rtol=1e-14, atol=1e-300)
    np.testing.assert_allclose(np.asarray(Br) + 1j * np.asarray(Bi), B,
                               rtol=1e-14, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Dr) + 1j * np.asarray(Di), D,
                               rtol=1e-14, atol=1e-300)
    if m.is_mps:
        Dc = np.asarray(m.get_D_transform(h)(th, 100.0))
        Dr2, Di2 = m.get_D_transform_split(h)(th, 100.0)
        np.testing.assert_allclose(np.asarray(Dr2) + 1j * np.asarray(Di2),
                                   Dc, rtol=1e-14, atol=1e-300)


@pytest.mark.parametrize("make", [
    lambda: Isotropic(7920.0, E=200e9, G=75e9, beta=0.003),
    lambda: Orthotropic(1600.0, E1=150e9, E2=9e9, G12=5e9, nu12=0.3,
                        beta=0.01),
    lambda: OrthotropicD4(1600.0, E1=150e9, E2=9e9, G12=5e9, nu12=0.3,
                          b1=0.01, b2=0.02, b3=0.015, b4=0.005),
    lambda: SOL(1600.0, [0.0, 45.0, 45.0, 0.0], E1=150e9, E2=9e9, G12=5e9,
                nu12=0.3, beta=0.01),
    lambda: SymmetricalSOL(1600.0, [0.0, 90.0, 90.0, 0.0], E1=150e9,
                           G12=5e9, nu12=0.3, beta=0.01),
], ids=["iso", "ortho", "orthoD4", "sol", "ssol"])
def test_split_transform_matches_complex(make):
    _assert_split_matches(make(), 2e-3)
