"""RCM block-tridiagonal band layout (ops/band.py) — the MXU operator path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.band import (
    BandLayout, band_mv, build_band_layout, flat_to_band, flat_to_band_host,
    permute_pattern, permute_vector,
)
from plate_inverse_problem_tpu.ops.scatter import spmv_flat


@pytest.fixture(scope="module")
def small_problem():
    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    geom = pip.Geometry("sh_i", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
    return geom, mat, acc


def test_band_mv_matches_scatter_spmv(small_problem):
    geom, mat, acc = small_problem
    p = pip.Problem(geom, mat, acc)
    rows = np.asarray(p.op.pattern.rows)
    cols = np.asarray(p.op.pattern.cols)
    n = p.n_free
    layout = build_band_layout(rows, cols, n)
    assert layout.bandwidth < layout.b
    rp, cp = permute_pattern(layout, rows, cols)

    rng = np.random.default_rng(3)
    vals = rng.standard_normal(rows.size)
    X = rng.standard_normal((5, n))

    band = flat_to_band(jnp.asarray(vals), layout, jnp.asarray(layout.lin))
    y_band = band_mv(band, jnp.asarray(X), layout)
    y_flat = spmv_flat(jnp.asarray(vals), jnp.asarray(rp), jnp.asarray(cp),
                       jnp.asarray(X), n)
    np.testing.assert_allclose(np.asarray(y_band), np.asarray(y_flat),
                               rtol=0, atol=1e-12 * np.abs(y_flat).max())

    # host builder agrees with the device scatter
    band_h = flat_to_band_host(vals, layout)
    np.testing.assert_allclose(band_h, np.asarray(band), rtol=0, atol=0)


def test_band_mv_f64_segmented_matches_one_gemm(small_problem):
    """Above _F64_SEG_THRESHOLD the f64 band GEMM scans the block axis in
    segments (the emulated-f64 dot's temps OOM'd the 82k-DOF sweep); the
    segmented and single-GEMM applies must agree exactly — segmentation
    splits block rows, never a contraction.  Also under vmap (the
    frequency-lane shape the solver actually runs) and jvp."""
    from plate_inverse_problem_tpu.ops import band as band_mod

    geom, mat, acc = small_problem
    p = pip.Problem(geom, mat, acc)
    rows = np.asarray(p.op.pattern.rows)
    cols = np.asarray(p.op.pattern.cols)
    n = p.n_free
    layout = build_band_layout(rows, cols, n)

    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.standard_normal(rows.size))
    X = jnp.asarray(rng.standard_normal((4, 2, n)))
    band = flat_to_band(vals, layout, jnp.asarray(layout.lin))
    assert band.dtype == jnp.float64

    y_ref = band_mv(band, X, layout)

    old = band_mod._F64_SEG_THRESHOLD, band_mod._F64_SEG_BUDGET
    # force: threshold below this band tensor, budget so qs < nb
    band_mod._F64_SEG_THRESHOLD = 0
    band_mod._F64_SEG_BUDGET = 8 * X.size // n * layout.b * 3 * layout.b * 8
    try:
        y_seg = band_mv(band, X, layout)
        np.testing.assert_array_equal(np.asarray(y_seg), np.asarray(y_ref))

        # vmapped lanes + jvp (the solver's actual shapes)
        f = lambda v, x: band_mv(
            flat_to_band(v, layout, jnp.asarray(layout.lin)), x, layout)
        y_v, dy_v = jax.jvp(f, (vals, X), (vals * 0.5, X * 0.0))
        band_mod._F64_SEG_THRESHOLD, band_mod._F64_SEG_BUDGET = old
        y_r, dy_r = jax.jvp(f, (vals, X), (vals * 0.5, X * 0.0))
        np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_r),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(dy_v), np.asarray(dy_r),
                                   rtol=0, atol=0)
    finally:
        band_mod._F64_SEG_THRESHOLD, band_mod._F64_SEG_BUDGET = old


def test_permute_vector_roundtrip():
    rng = np.random.default_rng(0)
    n = 37
    perm = rng.permutation(n)
    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)
    layout = BandLayout(n=n, b=8, nb=5, bandwidth=3, perm=perm, iperm=iperm,
                        lin=np.zeros(0, np.int32))
    v = rng.standard_normal(n)
    vp = permute_vector(layout, v)
    # entry i of the permuted vector is old entry perm[i]
    assert np.allclose(vp, v[perm])
    # consistency: permuting a stack along a middle axis
    V = rng.standard_normal((2, n, 3))
    Vp = permute_vector(layout, V, axis=1)
    assert np.allclose(Vp[1, :, 2], V[1, perm, 2])


def test_mixed_engine_band_matches_flat(small_problem):
    geom, mat, acc = small_problem
    freqs = np.linspace(60, 420, 12)
    p_flat = pip.Problem(geom, mat, acc, engine="mixed",
                         operator_layout="flat")
    p_band = pip.Problem(geom, mat, acc, engine="mixed",
                         operator_layout="band")
    th = np.asarray(p_flat.parameters)
    y_flat = np.asarray(p_flat.getFRFunction()(freqs, th))
    y_band = np.asarray(p_band.getFRFunction()(freqs, th))
    assert np.abs(y_band - y_flat).max() / np.abs(y_flat).max() < 1e-8

    def loss(prob, t):
        core, od = prob.getFRCore()
        return jnp.sum(jnp.abs(core(freqs, t, od)) ** 2)

    g_flat = jax.grad(lambda t: loss(p_flat, t))(jnp.asarray(th))
    g_band = jax.grad(lambda t: loss(p_band, t))(jnp.asarray(th))
    assert float(jnp.abs(g_band - g_flat).max()
                 / jnp.abs(g_flat).max()) < 1e-8


def test_mixed_engine_band_mg(small_problem):
    """band + multilevel preconditioner path (the 100k-DOF configuration)."""
    geom, mat, acc = small_problem
    geom = pip.Geometry("sh_i", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                        refine=2)
    freqs = np.linspace(60, 420, 8)
    p_flat = pip.Problem(geom, mat, acc, engine="mixed", precond="mg",
                         operator_layout="flat")
    p_band = pip.Problem(geom, mat, acc, engine="mixed", precond="mg",
                         operator_layout="band")
    th = np.asarray(p_flat.parameters)
    y_flat = np.asarray(p_flat.getFRFunction()(freqs, th))
    y_band = np.asarray(p_band.getFRFunction()(freqs, th))
    # different preconditioner roundoff paths -> agreement at the
    # refinement tolerance, not machine precision
    assert np.abs(y_band - y_flat).max() / np.abs(y_flat).max() < 3e-6


def test_band_symmetric_path(small_problem):
    """Pure-bending (midplane-symmetric, no accelerometer) path under the
    band layout — the other `_mixed_core` branch (the module-level tests
    above all run the 3-field path since they pass an accelerometer)."""
    geom, mat, _ = small_problem
    freqs = np.linspace(60, 300, 6)
    p_flat = pip.Problem(geom, mat, None, engine="mixed",
                         operator_layout="flat")
    p_band = pip.Problem(geom, mat, None, engine="mixed",
                         operator_layout="band")
    th = np.asarray(p_flat.parameters)
    y_flat = np.asarray(p_flat.getFRFunction()(freqs, th))
    y_band = np.asarray(p_band.getFRFunction()(freqs, th))
    assert np.abs(y_band - y_flat).max() / np.abs(y_flat).max() < 1e-8


def test_pallas_band_mv_matches_band_mv(small_problem):
    """The Pallas streaming kernel (interpret mode on CPU) must reproduce
    the XLA batched-GEMM band_mv bit-for-bit on a REAL plate operator
    layout — this also pins the edge-window assumption (flat_to_band
    leaves the out-of-range window slots zero, so the kernel's clamped
    edge loads multiply zeros)."""
    from plate_inverse_problem_tpu.ops.pallas_band import band_mv_pallas

    geom, mat, acc = small_problem
    p = pip.Problem(geom, mat, acc)
    rows = np.asarray(p.op.pattern.rows)
    cols = np.asarray(p.op.pattern.cols)
    n = p.n_free
    layout = build_band_layout(rows, cols, n)

    rng = np.random.default_rng(11)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    band = flat_to_band(jnp.asarray(vals), layout, jnp.asarray(layout.lin))
    for shape in [(16, n), (3, n), (n,), (2, 4, n)]:
        X = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        y_ref = np.asarray(band_mv(band.astype(jnp.float32), X, layout))
        y_pal = np.asarray(band_mv_pallas(band, X, layout, interpret=True))
        den = max(float(np.max(np.abs(y_ref))), 1e-30)
        assert np.max(np.abs(y_pal - y_ref)) / den < 1e-6, shape


def test_pallas_band_mv_small_blocks():
    """Block sizes that 128/256 do not divide (b=64 here) must still cover
    every output row — the row tile falls back to rt=b (regression: nr
    truncation silently zeroed the tail rows of each block).  A synthetic
    narrow-band pattern keeps the RCM bandwidth under 64."""
    from plate_inverse_problem_tpu.ops.pallas_band import band_mv_pallas

    n = 400
    w = 9  # half-bandwidth
    rows_l, cols_l = [], []
    for i in range(n):
        for j in range(max(0, i - w), min(n, i + w + 1)):
            rows_l.append(i)
            cols_l.append(j)
    rows = np.asarray(rows_l)
    cols = np.asarray(cols_l)
    layout = build_band_layout(rows, cols, n, block_multiple=64, min_block=64)
    assert layout.b % 128 != 0  # the case under test

    rng = np.random.default_rng(7)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    band = flat_to_band(jnp.asarray(vals), layout, jnp.asarray(layout.lin))
    X = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    y_ref = np.asarray(band_mv(band.astype(jnp.float32), X, layout))
    y_pal = np.asarray(band_mv_pallas(band, X, layout, interpret=True))
    den = max(float(np.max(np.abs(y_ref))), 1e-30)
    assert np.max(np.abs(y_pal - y_ref)) / den < 1e-6
