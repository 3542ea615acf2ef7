"""Optimizer unit tests on analytic objectives."""
import numpy as np
import jax.numpy as jnp

from plate_inverse_problem_tpu.optimize import (
    FixedParameterFunction,
    optimize_trust_region,
    optimize_gd,
    optimize_cd,
    optimize_cd_mem2,
    optimize_newton,
    optimize_lbfgs,
    solve_trust_region_model,
)


# The reference-style optimizers treat the objective as a non-negative
# fitting loss (stop when f <= f_min), so the test quadratic has min 0.
QUAD_MIN = np.array([0.7, -1.3])


def quad(x):
    A = jnp.asarray([[3.0, 0.5], [0.5, 1.0]])
    d = x - jnp.asarray(QUAD_MIN)
    return 0.5 * d @ A @ d


def rosen(x):
    return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def test_trust_region_quadratic():
    res = optimize_trust_region(quad, jnp.zeros(2), N_steps=20, delta_max=2.0)
    np.testing.assert_allclose(np.asarray(res.x), QUAD_MIN, rtol=1e-5)
    assert len(res.f_history) == len(res.x_history)


def test_trust_region_rosenbrock():
    res = optimize_trust_region(rosen, jnp.asarray([-0.5, 0.5]), N_steps=100,
                                delta_max=1.0)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=2e-3)


def test_trust_region_model_respects_radius():
    B = np.array([[2.0, 0.0], [0.0, -1.0]])  # indefinite
    g = np.array([1.0, 1.0])
    sd, lam, pred = solve_trust_region_model(jnp.asarray(B), jnp.asarray(g), 0.5)
    assert np.linalg.norm(np.asarray(sd)) <= 0.5 * (1 + 1e-6)
    assert pred >= 0


def test_gd_converges():
    res = optimize_gd(quad, jnp.zeros(2), N_steps=500, h=0.2)
    np.testing.assert_allclose(np.asarray(res.x), QUAD_MIN, atol=1e-3)


def test_cd_runs():
    res = optimize_cd(quad, jnp.zeros(2), N_steps=100, h=0.2)
    np.testing.assert_allclose(np.asarray(res.x), QUAD_MIN, atol=1e-2)


def test_cd_mem2_runs():
    res = optimize_cd_mem2(quad, jnp.zeros(2), N_steps=50, h=0.2)
    np.testing.assert_allclose(np.asarray(res.x), QUAD_MIN, atol=1e-2)


def test_newton_quadratic_one_step():
    res = optimize_newton(quad, jnp.zeros(2), N_steps=3)
    np.testing.assert_allclose(np.asarray(res.x), QUAD_MIN, rtol=1e-8)


def test_lbfgs_rosenbrock():
    res = optimize_lbfgs(rosen, jnp.asarray([-0.5, 0.5]), N_steps=200)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)


def test_fixed_parameter_function():
    f = FixedParameterFunction(quad, 2, 1, float(QUAD_MIN[1]))
    # optimizing only x0 with x1 fixed at optimum recovers x0 optimum
    xs = np.linspace(-1, 2, 201)
    vals = [float(f(jnp.asarray([x]))) for x in xs]
    np.testing.assert_allclose(xs[np.argmin(vals)], QUAD_MIN[0], atol=0.02)


def test_gauss_newton_on_residual():
    from plate_inverse_problem_tpu.optimize import optimize_gauss_newton

    target = jnp.asarray([1.5, -0.5])

    def resfn(x):
        # nonlinear residual with unique zero at target
        return jnp.asarray([
            x[0] - target[0],
            (x[1] - target[1]) * (1 + x[0] ** 2),
            0.1 * (x[0] - target[0]) * (x[1] - target[1]),
        ])

    res = optimize_gauss_newton(resfn, jnp.zeros(2), N_steps=25)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(target), atol=1e-7)
    assert res.f < 1e-14


def test_joint_residual_identifies_jointly():
    """Two datasets, each with a flat direction, jointly identify both params."""
    from plate_inverse_problem_tpu.optimize import (
        JointResidual, optimize_gauss_newton,
    )

    target = np.array([2.0, -1.0])

    def res_a(x):       # only sees x0
        return jnp.asarray([x[0] - target[0], 0.5 * (x[0] - target[0])])

    def res_b(x):       # only sees x1
        return jnp.asarray([x[1] - target[1]])

    joint = JointResidual([res_a, res_b], weights=[1.0, 2.0])
    v = np.asarray(joint(jnp.zeros(2)))
    assert v.shape == (3,)
    res = optimize_gauss_newton(joint, jnp.zeros(2), N_steps=10)
    np.testing.assert_allclose(np.asarray(res.x), target, atol=1e-8)


def test_joint_multicut_orthotropic_identification():
    """Three strip cuts (SOL at 0/90/45 deg) sharing one theta make the
    orthotropic inverse well-posed — the 45-degree cut couples G12/nu12
    into bending.  Full recipe in examples/joint_identification.py."""
    import plate_inverse_problem_tpu as pip
    from plate_inverse_problem_tpu.optimize.second_order import (
        JointResidual, optimize_gauss_newton,
    )

    TRUE = np.array([120e9, 8.5e9, 4.5e9, 0.30, 0.006])

    def make(angle):
        acc = pip.Accelerometer("AP1030")
        geom = pip.Geometry(
            "symm", acc,
            pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1,
        )
        mat = pip.get_material(
            1550.0, "sol", angles=(angle,),
            E1=TRUE[0], E2=TRUE[1], G12=TRUE[2], nu12=TRUE[3], beta=TRUE[4],
        )
        return pip.Problem(geom, mat, acc, engine="direct")

    freqs = np.linspace(40.0, 500.0, 48)
    problems = [make(a) for a in (0.0, 90.0, 45.0)]

    class Scaled:
        def __init__(self, res):
            self._res = res

        def __call__(self, s):
            return self._res(jnp.asarray(s) * TRUE)

        def value_and_jac(self, s):
            v, J = self._res.value_and_jac(jnp.asarray(s) * TRUE)
            return v, J * jnp.asarray(TRUE)[None, :]

    joint = JointResidual([
        Scaled(p.getResidualFunction(
            freqs, np.asarray(p.getFRFunction()(freqs, TRUE)).astype(complex),
            "log_afc"))
        for p in problems
    ])
    s0 = np.array([1.15, 0.85, 1.20, 0.90, 1.25])
    out = optimize_gauss_newton(joint, s0, N_steps=20)
    # |FRF| is even in beta, so +-beta are both exact minima of a
    # log-magnitude residual (phase data fixes the sign; kind='complex').
    np.testing.assert_allclose(np.abs(np.asarray(out.x)), 1.0, atol=1e-4)
