"""End-to-end Problem tests on small meshes (CPU backend).

Mirrors the reference's golden-value strategy (examples/basics.py) with
framework-internal oracles: cross-engine agreement, cross-path agreement,
gradient checks and a working inverse loop.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import plate_inverse_problem_tpu as pip


@pytest.fixture(scope="module")
def small_setup():
    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1
    )
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    return acc, geom, mat


@pytest.fixture(scope="module")
def problem_unsymm(small_setup):
    acc, geom, mat = small_setup
    return pip.Problem(geom, mat, acc)


def test_forward_runs_and_is_finite(problem_unsymm):
    freqs = np.linspace(40, 600, 20)
    fr = np.asarray(problem_unsymm.solveForward(freqs))
    assert fr.shape == (20,)
    assert np.all(np.isfinite(fr))
    assert np.all(fr > 0)  # magnitude response


def test_engines_agree_forward(small_setup):
    acc, geom, mat = small_setup
    p_modal = pip.Problem(geom, mat, acc, engine="modal")
    p_direct = pip.Problem(geom, mat, acc, engine="direct", chunk=4)
    freqs = np.linspace(40, 600, 12)
    fr_m = np.asarray(p_modal.solveForward(freqs))
    fr_d = np.asarray(p_direct.solveForward(freqs))
    np.testing.assert_allclose(fr_m, fr_d, rtol=1e-7)


def test_symm_path_matches_unsymm_w_with_massless_accel(small_setup):
    """The two assembly paths solve the same physics: with a massless,
    zero-sensitivity accelerometer the 3-field response reduces to |w| at
    the test point region (B=0 for isotropic, membrane decouples)."""
    acc, geom, mat = small_setup
    p_symm = pip.Problem(geom, mat, None)

    ghost = pip.Accelerometer(
        pip.AccelerometerParams(
            mass=0.0, radius=acc.radius, height=1e-9,
            effective_height=0.0, transverse_sensitivity=0.0,
        )
    )
    geom2 = pip.Geometry(
        "symm", ghost, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1
    )
    p_3f = pip.Problem(geom2, mat, ghost)

    freqs = np.linspace(60, 140, 8)  # below first resonance, smooth region
    fr_s = np.abs(np.asarray(p_symm.solveForward(freqs)))
    fr_3 = np.asarray(p_3f.solveForward(freqs))
    # symm readout is a point value, 3-field readout is a small-disk mean ->
    # agreement to ~1% in a smooth frequency band
    np.testing.assert_allclose(fr_3, fr_s, rtol=2e-2)


def test_loss_types_and_gradients(problem_unsymm):
    p = problem_unsymm
    freqs = np.linspace(40, 200, 6)
    ref = np.asarray(p.solveForward(freqs))
    for lt in ("MSE", "RMSE", "MSE_AFC", "MSE_LOG_AFC"):
        loss = p.getLossFunction(freqs, ref * 1.1, lt)
        val = float(loss(p.parameters))
        assert np.isfinite(val) and val > 0, lt
        g = np.asarray(jax.grad(loss)(p.parameters))
        assert np.all(np.isfinite(g)), lt


def test_loss_gradient_matches_fd(problem_unsymm):
    p = problem_unsymm
    freqs = np.linspace(40, 200, 5)
    ref = np.asarray(p.solveForward(freqs))
    loss = p.getLossFunction(freqs, ref, "MSE_LOG_AFC")

    theta0 = np.asarray(p.parameters)
    # perturbed point so gradient is nonzero
    theta = theta0 * np.array([1.05, 0.97, 1.2])
    g = np.asarray(jax.grad(loss)(jnp.asarray(theta)))

    for i in range(3):
        eps = abs(theta[i]) * 1e-5
        tp = theta.copy(); tp[i] += eps
        tm = theta.copy(); tm[i] -= eps
        fd = (float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-3, err_msg=f"param {i}")


def test_hessian_of_loss(problem_unsymm):
    p = problem_unsymm
    freqs = np.linspace(40, 150, 4)
    ref = np.asarray(p.solveForward(freqs))
    loss = p.getLossFunction(freqs, ref * 1.05, "MSE_LOG_AFC")
    H = np.asarray(jax.hessian(loss)(p.parameters))
    assert H.shape == (3, 3)
    assert np.all(np.isfinite(H))
    np.testing.assert_allclose(H, H.T, rtol=1e-6)


def test_inverse_gd_reduces_loss(problem_unsymm, tmp_path, monkeypatch):
    monkeypatch.setenv("PIP_TPU_OUTPUT_DIR", str(tmp_path))
    p = problem_unsymm
    freqs = np.linspace(40, 300, 10)
    fr = np.asarray(p.solveForward(freqs))
    res = p.solveInverseLocal(
        [0.05, 0.05, 0.1], "MSE_LOG_AFC", "grad_descent",
        ref_fr=[freqs, fr], use_rel=True, case_name="test_",
        N_steps=3, h=0.001, f_min=1e-12,
    )
    assert res.f_history[-1] <= res.f_history[0]
    # report + log artifacts written
    import os

    files = os.listdir(tmp_path)
    assert any(f.endswith(".txt") for f in files)
    assert any(f.endswith(".npz") for f in files)


def test_inverse_with_scaling_and_compression(problem_unsymm, tmp_path, monkeypatch):
    monkeypatch.setenv("PIP_TPU_OUTPUT_DIR", str(tmp_path))
    p = problem_unsymm
    freqs = np.linspace(40, 300, 40)
    fr = np.asarray(p.solveForward(freqs))
    res = p.solveInverse(
        [0.02, 0.02, 0.05], "MSE_LOG_AFC", "gd",
        ref_fr=[freqs, fr], use_rel=True, use_scaling=True,
        compression=(True, 20), comp_alg=0, report=False, log=False,
        N_steps=2, h=1e-5,
    )
    # result unscaled back to physical magnitudes; optimizer ran in O(1) space
    assert np.asarray(res.x)[0] > 1e10
    assert 0.5 < float(np.asarray(res.x_history[0])[0]) < 2.0


def test_setup_folder(tmp_path, monkeypatch, small_setup):
    """setups/<name>/setup.json convention (reference Problem.py:103-214)."""
    import json

    sdir = tmp_path / "setups" / "case1"
    sdir.mkdir(parents=True)
    setup = {
        "geometry": {"template": "symm", "length": 100e-3, "width": 20e-3,
                     "height": 2e-3, "accel_x": 10e-3, "ny": 1},
        "material": {"density": 7920.0, "atype": "isotropic",
                     "E": 200e9, "G": 75e9, "beta": 0.003},
        "accelerometer": "AP1030",
    }
    (sdir / "setup.json").write_text(json.dumps(setup))
    freqs = np.linspace(40, 100, 4)
    np.save(sdir / "freqs.npy", freqs)
    np.save(sdir / "amp.npy", np.ones(4))

    p = pip.Problem(spath=str(sdir))
    assert p.accelerometer.mass == 0.0017
    assert hasattr(p, "reference_fr")
    fr = p.solveForward(freqs)
    assert np.all(np.isfinite(np.asarray(fr)))


def test_mode_picture(small_setup):
    import matplotlib

    matplotlib.use("Agg")
    acc, geom, mat = small_setup
    p = pip.Problem(geom, mat, None)  # symmetric path
    vals = p.getModePicture(100.0)
    assert np.all(np.isfinite(vals))
    assert vals.shape[0] == p.mesh.num_nodes


def test_orthotropic_d4_uses_direct_engine(small_setup):
    acc, geom, mat = small_setup
    m4 = pip.OrthotropicD4(7920.0, E1=210e9, E2=200e9, G12=75e9, nu12=0.33,
                           b1=0.003, b2=0.003, b3=0.004, b4=0.0)
    p = pip.Problem(geom, m4, acc, chunk=4)
    assert p._engine() == "direct"
    fr = np.asarray(p.solveForward(np.linspace(40, 120, 4)))
    assert np.all(np.isfinite(fr))


def test_laminate_unsymm_path(small_setup):
    """Non-mid-plane-symmetric SOL forces the 3-field path with B != 0."""
    acc, geom, mat = small_setup
    sol = pip.SOL(1600.0, angles=[0.0, 90.0], E1=150e9, E2=9e9, G12=5e9,
                  nu12=0.3, beta=0.01)
    assert not sol.is_mps
    p = pip.Problem(geom, sol, acc)
    fr = np.asarray(p.solveForward(np.linspace(40, 120, 4)))
    assert np.all(np.isfinite(fr))


def test_mixed_engine_matches_modal_cpu(small_setup):
    """engine='mixed' through the full Problem pipeline agrees with the
    exact f64 modal engine (CPU)."""
    acc, geom, mat = small_setup
    p_modal = pip.Problem(geom, mat, acc, engine="modal")
    p_mixed = pip.Problem(geom, mat, acc, engine="mixed")
    freqs = np.linspace(40, 600, 16)
    fr_m = np.asarray(p_modal.solveForward(freqs))
    fr_x = np.asarray(p_mixed.solveForward(freqs))
    np.testing.assert_allclose(fr_x, fr_m, rtol=1e-6)


def test_mixed_engine_loss_grad(small_setup):
    """Mixed-engine gradients match the exact f64 modal-engine gradients.

    (FD is too noisy an oracle here: the beta step that stays in the linear
    regime sits at the refinement noise floor of the loss.)"""
    acc, geom, mat = small_setup
    p = pip.Problem(geom, mat, acc, engine="mixed")
    pm = pip.Problem(geom, mat, acc, engine="modal")
    freqs = np.linspace(40, 300, 6)
    ref = np.asarray(p.solveForward(freqs))
    loss = p.getLossFunction(freqs, ref, "MSE_LOG_AFC")
    loss_m = pm.getLossFunction(freqs, ref, "MSE_LOG_AFC")
    theta = jnp.asarray(np.asarray(p.parameters) * np.array([1.03, 0.98, 1.1]))
    g = np.asarray(jax.grad(loss)(theta))
    g_m = np.asarray(jax.grad(loss_m)(theta))
    np.testing.assert_allclose(g, g_m, rtol=1e-5, atol=1e-13)


def test_mixed_engine_d4_matches_direct(small_setup):
    """Per-modulus loss factors (no scalar beta): the mixed engine's residual
    uses the true K_im, so it matches the exact direct engine."""
    acc, geom, mat = small_setup
    m4 = pip.OrthotropicD4(7920.0, E1=210e9, E2=200e9, G12=75e9, nu12=0.33,
                           b1=0.002, b2=0.004, b3=0.006, b4=0.001)
    p_mixed = pip.Problem(geom, m4, acc, engine="mixed")
    p_direct = pip.Problem(geom, m4, acc, engine="direct", chunk=4)
    freqs = np.linspace(40, 500, 8)
    fr_x = np.asarray(p_mixed.solveForward(freqs))
    fr_d = np.asarray(p_direct.solveForward(freqs))
    np.testing.assert_allclose(fr_x, fr_d, rtol=1e-6)


def test_global_optimizers_de_shgo(problem_unsymm, tmp_path, monkeypatch):
    """scipy global optimizers wired through solveInverse
    (reference Problem.py:813-828)."""
    monkeypatch.setenv("PIP_TPU_OUTPUT_DIR", str(tmp_path))
    p = problem_unsymm
    freqs = np.linspace(40, 200, 6)
    fr = np.asarray(p.solveForward(freqs))
    theta0 = np.asarray(p.parameters)
    bounds = np.stack([theta0 * 0.8, theta0 * 1.2], axis=1)

    res = p.solveInverse(bounds, "MSE_LOG_AFC", "de", ref_fr=[freqs, fr],
                         report=False, log=False, maxiter=2, popsize=4,
                         tol=10.0, seed=0, polish=False)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert hasattr(res, "f") and hasattr(res, "niter")

    res2 = p.solveInverse(bounds, "MSE_LOG_AFC", "shgo", ref_fr=[freqs, fr],
                          report=False, log=False,
                          options={"maxiter": 2, "f_tol": 1.0})
    assert np.all(np.isfinite(np.asarray(res2.x)))


def test_gauss_newton_inverse(problem_unsymm, tmp_path, monkeypatch):
    """Gauss-Newton through solveInverse recovers perturbed parameters."""
    monkeypatch.setenv("PIP_TPU_OUTPUT_DIR", str(tmp_path))
    p = problem_unsymm
    freqs = np.linspace(40, 300, 12)
    fr = np.asarray(p.solveForward(freqs))
    res = p.solveInverse(
        [0.03, 0.03, 0.1], "MSE_LOG_AFC", "gauss_newton",
        ref_fr=[freqs, fr], use_rel=True, report=False, log=False,
        N_steps=8,
    )
    # GN must fit the data to numerical precision; individual parameters sit
    # in a weakly-identified valley on this coarse off-peak grid (physics,
    # not the optimizer: E-G trade off below the first resonance)
    assert res.f < 1e-6
    assert res.f_history[0] / max(res.f, 1e-300) > 1e3
    fr_fit = np.asarray(p.solveForward(freqs, res.x))
    np.testing.assert_allclose(fr_fit, fr, rtol=1e-3)


def test_residual_value_and_jac_matches_jacfwd(problem_unsymm):
    """The fused value-and-jacfwd (one shared primal + p jvp lanes) must
    reproduce the reference formulation r = f(x), J = jacfwd(f)(x) exactly,
    for every residual kind."""
    p = problem_unsymm
    freqs = np.linspace(40, 300, 8)
    ref = np.asarray(p.solveForward(freqs))
    th = jnp.asarray(np.asarray(p.parameters) * jnp.asarray([1.02, 1.01, 1.1]))
    for kind in ("log_afc", "afc", "complex"):
        rf = p.getResidualFunction(freqs, ref, kind=kind, jac_mode="fwd")
        r, J = rf.value_and_jac(th)
        r_ref = rf(th)
        J_ref = jax.jacfwd(rf)(th)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                                   rtol=1e-12, atol=1e-14)


@pytest.fixture(scope="module")
def problem_unsymm_mixed(small_setup):
    acc, geom, mat = small_setup
    return pip.Problem(geom, mat, acc, engine="mixed")


@pytest.fixture(scope="module")
def problem_symm_mixed(small_setup):
    acc, geom, mat = small_setup
    return pip.Problem(geom, mat, None, engine="mixed")


def test_residual_adjoint_jacobian_matches_fwd(problem_unsymm_mixed,
                                               problem_symm_mixed):
    """The adjoint Jacobian (2 solves: primal + one batched adjoint, plus
    p solve-free passes through the explicit residual map) must agree with
    the implicit-diff jacfwd Jacobian on both assembly paths and both
    scalar residual kinds.  The two formulations share no AD code path —
    agreement is a strong end-to-end check of the adjoint identity
    J = -y^T (dA u - db) against (1+p) independent JVP solves."""
    for p in (problem_unsymm_mixed, problem_symm_mixed):
        freqs = np.linspace(40, 300, 9)
        ref = np.asarray(p.solveForward(freqs))
        th = jnp.asarray(np.asarray(p.parameters)
                         * jnp.asarray([1.05, 1.02, 1.2]))
        for kind in ("log_afc", "afc"):
            rf_a = p.getResidualFunction(freqs, ref, kind=kind,
                                         jac_mode="adjoint")
            rf_f = p.getResidualFunction(freqs, ref, kind=kind,
                                         jac_mode="fwd")
            assert rf_a.jac_mode == "adjoint" and rf_f.jac_mode == "fwd"
            ra, Ja = rf_a.value_and_jac(th)
            rc, Jf = rf_f.value_and_jac(th)
            np.testing.assert_allclose(np.asarray(ra), np.asarray(rc),
                                       rtol=1e-12, atol=1e-14)
            Jf = np.asarray(Jf)
            np.testing.assert_allclose(
                np.asarray(Ja), Jf, rtol=1e-6,
                atol=1e-8 * float(np.abs(Jf).max()), err_msg=kind)


def test_residual_adjoint_segmented_apply(problem_unsymm_mixed, monkeypatch):
    """Force the unrolled nnz segmentation of _fused_apply_flat (the >262k-
    nnz scale-tier path, where rows/cols must stay traced — constant index
    sets stall the TPU AOT compiler) and check the adjoint Jacobian is
    unchanged."""
    from plate_inverse_problem_tpu.ops import mixed as _m
    p = problem_unsymm_mixed
    freqs = np.linspace(40, 300, 9)
    ref = np.asarray(p.solveForward(freqs))
    th = jnp.asarray(np.asarray(p.parameters) * jnp.asarray([1.05, 1.02, 1.2]))
    rf_f = p.getResidualFunction(freqs, ref, jac_mode="fwd")
    _, Jf = rf_f.value_and_jac(th)
    monkeypatch.setattr(_m, "_RES_SEG", 64)
    # fresh ResidualFunction: _RES_SEG is read at trace time inside the
    # new rj_adjoint jit (the memoized core itself is unchanged)
    rf_a = p.getResidualFunction(freqs, ref, jac_mode="adjoint")
    _, Ja = rf_a.value_and_jac(th)
    Jf = np.asarray(Jf)
    np.testing.assert_allclose(np.asarray(Ja), Jf, rtol=1e-6,
                               atol=1e-8 * float(np.abs(Jf).max()))


def test_residual_adjoint_chunked_apply(problem_unsymm_mixed, monkeypatch):
    """Shrink the apply budget so the residual-map jacfwd runs through the
    frequency-chunked lax.map path (the 46k-tier OOM guard) including a
    ragged tail chunk, and check the Jacobian is unchanged."""
    from plate_inverse_problem_tpu.models import problem as _prob
    p = problem_unsymm_mixed
    freqs = np.linspace(40, 300, 19)       # 2 chunks of 8 + ragged 3
    ref = np.asarray(p.solveForward(freqs))
    th = jnp.asarray(np.asarray(p.parameters) * jnp.asarray([1.05, 1.02, 1.2]))
    _, Jf = p.getResidualFunction(freqs, ref,
                                  jac_mode="fwd").value_and_jac(th)
    monkeypatch.setattr(_prob, "_APPLY_BUDGET", 1.0)   # forces C = 8 < F
    _, Ja = p.getResidualFunction(freqs, ref,
                                  jac_mode="adjoint").value_and_jac(th)
    Jf = np.asarray(Jf)
    np.testing.assert_allclose(np.asarray(Ja), Jf, rtol=1e-6,
                               atol=1e-8 * float(np.abs(Jf).max()))


def test_residual_jac_mode_resolution(problem_unsymm, problem_unsymm_mixed):
    """'auto' resolves to adjoint on mixed-engine cores for scalar kinds,
    to fwd for the 'complex' kind and for engines without the hooks
    (the CPU default modal engine)."""
    freqs = np.linspace(40, 300, 8)
    ref = np.asarray(problem_unsymm_mixed.solveForward(freqs))
    assert problem_unsymm_mixed.getResidualFunction(
        freqs, ref).jac_mode == "adjoint"
    assert problem_unsymm_mixed.getResidualFunction(
        freqs, ref * (1 + 0j), kind="complex").jac_mode == "fwd"
    assert problem_unsymm.getResidualFunction(
        freqs, np.asarray(problem_unsymm.solveForward(freqs)),
    ).jac_mode == "fwd"
    with pytest.raises(ValueError):
        problem_unsymm_mixed.getResidualFunction(
            freqs, ref * (1 + 0j), kind="complex", jac_mode="adjoint")


def test_residual_adjoint_jacobian_sol_5params(small_setup):
    """5-parameter SOL material through the adjoint Jacobian — the case
    the adjoint formulation exists for (2 solves instead of 6)."""
    acc, geom, mat_iso = small_setup
    mat = pip.get_material(1550.0, "sol", angles=(0.0,),
                           E1=120e9, E2=8.5e9, G12=4.5e9, nu12=0.30,
                           beta=0.006)
    p = pip.Problem(geom, mat, acc, engine="mixed")
    freqs = np.linspace(40, 300, 8)
    th = np.asarray(p.parameters)
    ref = np.asarray(p.solveForward(freqs, th))
    th2 = jnp.asarray(th) * jnp.asarray([1.1, 0.95, 1.05, 1.02, 1.3])
    rf_a = p.getResidualFunction(freqs, ref, jac_mode="adjoint",
                                 scaling_params=jnp.asarray(th))
    rf_f = p.getResidualFunction(freqs, ref, jac_mode="fwd",
                                 scaling_params=jnp.asarray(th))
    sc = th2 / jnp.asarray(th)
    ra, Ja = rf_a.value_and_jac(sc)
    rc, Jf = rf_f.value_and_jac(sc)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rc),
                               rtol=1e-12, atol=1e-14)
    Jf = np.asarray(Jf)
    np.testing.assert_allclose(np.asarray(Ja), Jf, rtol=1e-6,
                               atol=1e-8 * float(np.abs(Jf).max()))


def test_residual_chunking_matches_unchunked(problem_unsymm):
    p = problem_unsymm
    freqs = np.linspace(40, 300, 10)
    ref = np.asarray(p.solveForward(freqs))
    r1 = p.getResidualFunction(freqs, ref * 1.1)
    r2 = p.getResidualFunction(freqs, ref * 1.1, freq_chunk=4)
    th = jnp.asarray(np.asarray(p.parameters) * 1.02)
    v1, J1 = r1.value_and_jac(th)
    v2, J2 = r2.value_and_jac(th)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1), rtol=1e-5, atol=1e-12)


class _FreqDepIsotropic(pip.Isotropic):
    """Custom material with omega-dependent damping beta(omega) =
    beta0 * (1 + omega/omega_ref) — exercises the reference's per-frequency
    transform contract (Problem.py:397-399) through the direct engine."""

    OMEGA_REF = 2.0 * np.pi * 300.0

    def get_D_transform(self, h):
        base = super().get_D_transform(h)

        def _t(params, omega=0.0):
            E, G, beta = params[0], params[1], params[2]
            b_om = beta * (1.0 + omega / self.OMEGA_REF)
            return base(jnp.stack([E, G, b_om]), 0.0)

        return _t

    def get_ABD_transform(self, h):
        base = super().get_ABD_transform(h)

        def _t(params, omega=0.0):
            E, G, beta = params[0], params[1], params[2]
            b_om = beta * (1.0 + omega / self.OMEGA_REF)
            return base(jnp.stack([E, G, b_om]), 0.0)

        return _t

    @property
    def scalar_loss_factor(self):
        return False


def test_frequency_dependent_transform_direct_engine():
    """Per-frequency material evaluation: the omega-dependent transform run
    through one sweep matches omega-constant problems evaluated one
    frequency at a time with beta pinned to beta(omega_i)."""
    acc = pip.Accelerometer("AP1030")
    gp = dict(length=100e-3, width=20e-3, height=2e-3, accel_x=10e-3)
    mat_fd = _FreqDepIsotropic(7920.0, E=200e9, G=75e9, beta=0.01)
    geom = pip.Geometry("symm", acc, pip.GeometryParams(**gp), ny=1)
    p_fd = pip.Problem(geom, mat_fd, acc, engine="direct")
    freqs = np.array([80.0, 150.0, 300.0])
    theta = np.asarray(p_fd.parameters)
    y_fd = np.asarray(p_fd.getFRFunction()(freqs, theta))

    for i, f in enumerate(freqs):
        om = 2.0 * np.pi * f
        b_i = 0.01 * (1.0 + om / _FreqDepIsotropic.OMEGA_REF)
        mat_i = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=b_i)
        geom_i = pip.Geometry("symm", acc, pip.GeometryParams(**gp), ny=1)
        p_i = pip.Problem(geom_i, mat_i, acc, engine="direct")
        theta_i = np.array([theta[0], theta[1], b_i])
        y_i = np.asarray(p_i.getFRFunction()(np.array([f]), theta_i))
        np.testing.assert_allclose(y_fd[i], y_i[0], rtol=1e-9)


def test_frequency_dependent_transform_falls_back_from_modal():
    """Asking the modal engine to run an omega-dependent material warns and
    silently uses the direct engine instead of returning wrong physics."""
    acc = pip.Accelerometer("AP1030")
    mat_fd = _FreqDepIsotropic(7920.0, E=200e9, G=75e9, beta=0.01)
    geom = pip.Geometry(
        "symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1
    )
    p = pip.Problem(geom, mat_fd, acc, engine="modal")
    with pytest.warns(RuntimeWarning, match="frequency-dependent"):
        core, opdata = p.getFRCore()


def test_mode_picture_both_paths(tmp_path):
    """getModePicture renders on the symmetric AND 3-field paths (the
    reference raises NotImplementedError for the latter, Problem.py:536)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

    def geom():
        return pip.Geometry(
            "symm", acc,
            pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1,
        )

    p3 = pip.Problem(geom(), mat, acc)
    theta = np.asarray(p3.parameters)
    fig, ax = plt.subplots()
    p3.getModePicture(150.0, ax=ax)
    fig.savefig(tmp_path / "m3.png")

    ps = pip.Problem(geom(), mat, None)
    fig, ax = plt.subplots()
    ps.getModePicture(150.0, ax=ax, params=theta)
    fig.savefig(tmp_path / "ms.png")
    plt.close("all")


def test_call_segmentation_matches_unsegmented():
    """Host-level call segmentation (the big-DOF TPU execution-time-limit
    workaround) is exact: loss/grad/hessian and residual/Jacobian match the
    single-call path, including the 'complex' residual's [re, im] layout
    and a padded final segment."""
    import jax
    import jax.numpy as jnp
    from plate_inverse_problem_tpu.models.problem import (
        LossFunction, ResidualFunction)

    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    geom = pip.Geometry("sh_i", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                        ny=1)
    p = pip.Problem(geom, mat, acc, engine="mixed")
    core, od = p.getFRCore()
    freqs = np.linspace(60, 420, 11)          # 11 -> segments of 4 (pad 1)
    th = np.asarray(p.parameters)
    y = np.asarray(p.getFRFunction()(freqs, th)).astype(np.complex128)
    th2 = jnp.asarray(th * 1.07)

    lf0 = LossFunction(core, od, freqs, y, "MSE_LOG_AFC")
    lf1 = LossFunction(core, od, freqs, y, "MSE_LOG_AFC", call_seg=4)
    np.testing.assert_allclose(float(lf1(th2)), float(lf0(th2)), rtol=1e-9)
    v0, g0 = lf0.value_and_grad(th2)
    v1, g1 = lf1.value_and_grad(th2)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-8,
        atol=1e-10 * float(np.abs(np.asarray(g0)).max()))
    H0 = np.asarray(lf0.hessian(th2))
    np.testing.assert_allclose(np.asarray(lf1.hessian(th2)), H0, rtol=1e-6,
                               atol=1e-8 * float(np.abs(H0).max()))

    for kind in ("log_afc", "complex"):
        rf0 = ResidualFunction(core, od, freqs, y, kind=kind)
        rf1 = ResidualFunction(core, od, freqs, y, kind=kind, call_seg=4)
        r0, J0 = rf0.value_and_jac(th2)
        r1, J1 = rf1.value_and_jac(th2)
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r0), rtol=1e-8,
            atol=1e-10 * float(np.abs(np.asarray(r0)).max()),
            err_msg=kind)
        np.testing.assert_allclose(
            np.asarray(J1), np.asarray(J0), rtol=1e-6,
            atol=1e-8 * float(np.abs(np.asarray(J0)).max()), err_msg=kind)
        np.testing.assert_allclose(
            np.asarray(rf1(th2)), np.asarray(r0), rtol=1e-8,
            atol=1e-10 * float(np.abs(np.asarray(r0)).max()))


def test_sol_cuts_share_one_executable(small_setup):
    """Multi-cut SOL Problems (same geometry, different laminate angles)
    must lower to byte-identical HLO: the per-angle Q->(A,B,D) maps travel
    in opdata (``trc``, problem._hoist_split_transform), not as HLO
    constants.  Without this, every cut of a joint identification pays the
    full scale-tier XLA compile (~3x measured on the 3-cut north star)."""
    acc, geom, _ = small_setup
    freqs = jnp.linspace(40.0, 600.0, 4)
    th = jnp.asarray([120e9, 8.5e9, 4.5e9, 0.30, 0.006], jnp.float64)
    for engine in ("modal", "mixed"):
        texts = []
        for a in (0.0, 45.0):
            mat = pip.get_material(
                1550.0, "sol", angles=(a,), E1=120e9, E2=8.5e9,
                G12=4.5e9, nu12=0.30, beta=0.006)
            p = pip.Problem(geom, mat, acc, engine=engine)
            core, od = p.getFRCore()
            assert od["trc"], "SOL transform consts should be hoisted"
            texts.append(jax.jit(core).lower(freqs, th, od).as_text())
        assert texts[0] == texts[1], f"engine={engine}: cuts recompile"


def test_hoisted_transform_matches_direct_eval(small_setup):
    """The hoisted-const transform path is numerically identical to the
    closure transform it replaces (same jaxpr, consts as arguments)."""
    from plate_inverse_problem_tpu.models.problem import _hoist_split_transform

    mat = pip.get_material(1550.0, "sol", angles=(30.0,), E1=120e9,
                           E2=8.5e9, G12=4.5e9, nu12=0.30, beta=0.006)
    tr = mat.get_D_transform_split(2e-3)
    fn, consts = _hoist_split_transform(tr, 5)
    th = jnp.asarray([120e9, 8.5e9, 4.5e9, 0.30, 0.006], jnp.float64)
    om = jnp.asarray(100.0, jnp.float64)
    a = jax.tree_util.tree_leaves(tr(th, om))
    b = jax.tree_util.tree_leaves(fn(th, om, *consts))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_complex_reference_split_layout(problem_unsymm):
    """complex128 references must work through every loss/residual kind.

    complex128 is not a TPU dtype — LossFunction/ResidualFunction stack
    the reference into an (F, 2) (re, im) real layout at the host
    boundary (models/problem._split_ref).  Semantics vs the reference
    (Problem.py getLossFunction): identical to computing with the
    complex value directly.
    """
    p = problem_unsymm
    freqs = np.linspace(40, 200, 6)
    y = np.asarray(p.solveForward(freqs))
    yc = y.astype(np.complex128)
    theta = jnp.asarray(p.parameters)

    # at the truth every loss kind vanishes and gradients are finite
    for lt in ("MSE", "RMSE", "MSE_AFC", "MSE_LOG_AFC"):
        loss = p.getLossFunction(freqs, yc, lt)
        assert float(loss(theta)) < 1e-14, lt
        g = np.asarray(jax.grad(loss)(theta))
        assert np.all(np.isfinite(g)), lt

    # a phase-rotated complex reference: |.|-based kinds are invariant,
    # MSE matches the closed form |fr - ref|^2 exactly
    yrot = yc * np.exp(0.7j)
    assert float(p.getLossFunction(freqs, yrot, "MSE_LOG_AFC")(theta)) < 1e-14
    got = float(p.getLossFunction(freqs, yrot, "MSE")(theta))
    expect = float(np.mean(np.abs(y - yrot) ** 2))
    np.testing.assert_allclose(got, expect, rtol=1e-9)

    # residual kinds: zero at truth, finite Jacobians, complex kind
    # splits into (re, im) stacked residuals of length 2F
    for kind, length in (("complex", 12), ("afc", 6), ("log_afc", 6)):
        rf = p.getResidualFunction(freqs, yc, kind=kind)
        r, J = rf.value_and_jac(theta)
        r, J = np.asarray(r), np.asarray(J)
        assert r.shape == (length,), kind
        assert np.abs(r).max() < 1e-7, kind
        assert np.all(np.isfinite(J)), kind

    # the complex residual kind SEES the phase: rotated ref gives a
    # nonzero residual whose norm^2 matches F * MSE
    rf = p.getResidualFunction(freqs, yrot, kind="complex")
    r, _ = rf.value_and_jac(theta)
    np.testing.assert_allclose(
        float(np.sum(np.asarray(r) ** 2) / len(freqs)), expect, rtol=1e-9)
