"""Schur-recursive dense inversion (ops/dense.py) — the TPU LU-panel
workaround for >16k-row coarse operators."""
import numpy as np
import jax.numpy as jnp

from plate_inverse_problem_tpu.ops.dense import inv_blocked


def test_inv_blocked_matches_direct():
    rng = np.random.default_rng(7)
    n = 700
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T + n * np.eye(n, dtype=np.float32)  # SPD
    iA = np.asarray(inv_blocked(jnp.asarray(A), direct_max=128))
    err = np.abs(iA @ A - np.eye(n)).max()
    assert err < 1e-4  # f32 inverse quality

    # direct path (n below the threshold) agrees with numpy
    small = A[:100, :100]
    i_small = np.asarray(inv_blocked(jnp.asarray(small), direct_max=256))
    np.testing.assert_allclose(i_small @ small, np.eye(100), atol=1e-4)


def test_inv_blocked_odd_split():
    """Non-power-of-two sizes exercise the lane-aligned split logic."""
    rng = np.random.default_rng(1)
    for n in (257, 391):
        A = rng.standard_normal((n, n)).astype(np.float32)
        A = A @ A.T + n * np.eye(n, dtype=np.float32)
        iA = np.asarray(inv_blocked(jnp.asarray(A), direct_max=128))
        assert np.abs(iA @ A - np.eye(n)).max() < 1e-4
