"""Exact-integer limb band apply (ops/ozaki.py) vs the f64 band GEMM.

Counterpart workload: the reference's per-call CSC matvec
(csc_matvec.h:31-66) at f64 grade on integer MXU arithmetic.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from plate_inverse_problem_tpu.ops.band import (
    band_mv, build_band_layout, flat_to_band,
)
from plate_inverse_problem_tpu.ops.ozaki import (
    N_LIMBS, _peel_digits, _pow2_ceil, build_ozaki_band, ozaki_mv,
)


def test_pow2_ceil_exact_brackets():
    m = jnp.asarray([0.0, 1e-30, 0.4999, 0.5, 1.0, 1.5, 2.0, 1e12,
                     2.0 ** 53, 3.7e-9])
    t = np.asarray(_pow2_ceil(m))
    m = np.asarray(m)
    assert np.all(t >= np.where(m == 0, 1.0, m))
    assert np.all((t * 0.5 < m) | (m == 0))
    # exact powers of two
    assert np.all(np.log2(t) == np.round(np.log2(t)))


def test_peel_digits_reconstructs():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, size=4096))
    D = np.asarray(_peel_digits(u, N_LIMBS), dtype=np.float64)
    assert np.abs(D).max() <= 32
    w = 64.0 ** -(np.arange(1, N_LIMBS + 1))
    rec = np.einsum("l,ln->n", w, D)
    assert np.abs(rec - np.asarray(u)).max() < 2.0 ** (-6 * N_LIMBS)


def _random_band_problem(rng, n=700, bw=37, nnz=9000, spread=1e8):
    rows = rng.integers(0, n, size=nnz)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, size=nnz), 0, n - 1)
    # huge dynamic range across rows — the scheme's scales are per-row
    vals = (rng.standard_normal(nnz)
            * np.exp(rng.uniform(0, np.log(spread), size=nnz)))
    return rows, cols, vals


@pytest.mark.parametrize("lead", [(), (3,), (2, 4)])
def test_ozaki_matches_band_mv(lead):
    rng = np.random.default_rng(5)
    n = 700
    rows, cols, vals = _random_band_problem(rng, n=n)
    layout = build_band_layout(rows, cols, n)
    lin = jnp.asarray(layout.lin)
    bK = flat_to_band(jnp.asarray(vals), layout, lin)
    bM = flat_to_band(jnp.asarray(np.abs(vals) + 1.0), layout, lin)
    stack = jnp.stack([bK, bM])

    oz = build_ozaki_band(stack, layout)
    x = jnp.asarray(rng.standard_normal(lead + (n,)))
    got = ozaki_mv(oz, x)
    refK = band_mv(bK, x, layout)
    refM = band_mv(bM, x, layout)
    for got_s, ref in ((got[0], refK), (got[1], refM)):
        scale = float(jnp.max(jnp.abs(ref)))
        err = float(jnp.max(jnp.abs(got_s - ref))) / scale
        assert err < 1e-12, err


def test_ozaki_abs_sum_relative_accuracy():
    """Error must be ~2^-49 of the ABS-SUM: feed a near-null vector so
    the true product cancels heavily (the resonance-iterate regime that
    floors sloppier applies)."""
    rng = np.random.default_rng(7)
    n = 512
    rows, cols, vals = _random_band_problem(rng, n=n, nnz=6000, spread=1.0)
    layout = build_band_layout(rows, cols, n)
    bK = flat_to_band(jnp.asarray(vals), layout, jnp.asarray(layout.lin))

    import scipy.sparse as sp
    Ad = np.zeros((n, n))
    np.add.at(Ad, (rows, cols), vals)        # duplicates accumulate, like
    del sp                                   # the flat_to_band scatter
    w, v = np.linalg.eigh((Ad + Ad.T) / 2)
    x = v[:, np.argmin(np.abs(w))]           # heavy cancellation direction
    xp = x[layout.perm]

    refp = (Ad @ x)[layout.perm]             # host, exactly rounded f64
    abs_sum = float((np.abs(Ad) @ np.abs(x)).max())
    oz = build_ozaki_band(bK[None], layout)
    gotp = np.asarray(ozaki_mv(oz, jnp.asarray(xp))[0])
    err = float(np.max(np.abs(gotp - refp)))
    assert err < 1e-12 * abs_sum, (err, abs_sum)


def test_ozaki_real_operator_small_problem():
    """Through the real FEM operator of a small Problem."""
    import plate_inverse_problem_tpu as pip

    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
    geom = pip.Geometry("symm", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
                        ny=2)
    p = pip.Problem(geom, mat, acc)
    rows = np.asarray(p.op.pattern.rows)
    cols = np.asarray(p.op.pattern.cols)
    n = p.n_free
    layout = build_band_layout(rows, cols, n)
    lin = jnp.asarray(layout.lin)
    rng0 = np.random.default_rng(3)
    # FEM sparsity with a stiffness-like 1e8 dynamic range across entries
    K_flat = (rng0.standard_normal(rows.size)
              * np.exp(rng0.uniform(0, np.log(1e8), size=rows.size)))
    M_flat = np.abs(rng0.standard_normal(rows.size)) + 0.1
    bK = flat_to_band(jnp.asarray(K_flat), layout, lin)
    bM = flat_to_band(jnp.asarray(M_flat), layout, lin)
    oz = build_ozaki_band(jnp.stack([bK, bM]), layout)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, n)))
    got = ozaki_mv(oz, x)
    refK = band_mv(bK, x, layout)
    refM = band_mv(bM, x, layout)
    for g, r in ((got[0], refK), (got[1], refM)):
        err = float(jnp.max(jnp.abs(g - r)) / jnp.max(jnp.abs(r)))
        assert err < 1e-12, err


def test_ozaki_mixed_engine_end_to_end():
    """Problem(ozaki=True) through the public API vs the modal engine:
    the integrated band-tier limb apply must deliver engine-agreement
    accuracy, and the loss gradient must stay finite (AD rides the flat
    scatter, not the limbs)."""
    import plate_inverse_problem_tpu as pip

    acc = pip.Accelerometer("AP1030")
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
    geom = pip.Geometry("symm", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None),
                        ny=2)
    f = np.linspace(60, 400, 5)
    pm = pip.Problem(geom, mat, acc, engine="modal")
    ym = pm.getFRFunction()(f, np.asarray(pm.parameters))
    p = pip.Problem(geom, mat, acc, engine="mixed", operator_layout="band",
                    ozaki=True)
    y = p.getFRFunction()(f, np.asarray(p.parameters))
    rel = float(np.max(np.abs(y - ym) / np.abs(ym)))
    assert rel < 1e-5, rel
    g = np.asarray(p.getLossFunction(f, ym, "MSE_LOG_AFC").grad(
        np.asarray(p.parameters) * 1.02))
    assert np.all(np.isfinite(g))
