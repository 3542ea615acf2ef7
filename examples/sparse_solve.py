"""Standalone sparse-solve API — independent of the plate pipeline.

The reference exposes its UMFPACK bridge as general CSC primitives
(create_symbolic/spsolve/matvec, reference Sparse.py:92-236); this is the
TPU-native counterpart: same canonical pattern contract, implicit-diff AD,
and native vmap/hessian batching.  Runs on CPU or TPU (64-bit solves on TPU
go through a 32-bit MXU LU + exact split-f64 iterative refinement).
"""
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from plate_inverse_problem_tpu.ops import create_symbolic, matvec, spsolve

# any square sparse system — here a 1D Poisson matrix with a parameter
n = 200
main = 2.0 * np.ones(n)
off = -1.0 * np.ones(n - 1)
A = sp.diags([off, main, off], [-1, 0, 1]).tocoo()

(rows, cols), pattern = create_symbolic(
    n, np.stack([A.row, A.col], axis=1).astype(np.int32), np.float64)
# data must live in the canonical (CSC) entry order returned above
key = cols.astype(np.int64) * n + rows.astype(np.int64)
src = A.col.astype(np.int64) * n + A.row.astype(np.int64)
data = np.zeros(pattern.nnz)
np.add.at(data, np.searchsorted(key, src), A.data)

b = np.sin(np.linspace(0, np.pi, n))

x = spsolve(pattern, jnp.asarray(data), jnp.asarray(b))
print("residual:", float(jnp.linalg.norm(
    matvec(pattern, jnp.asarray(data), x) - jnp.asarray(b))))

# gradients through the solve (adjoint method, never unrolled):
def loss(theta):
    return jnp.sum(spsolve(pattern, theta * jnp.asarray(data),
                           jnp.asarray(b)) ** 2)

g = jax.grad(loss)(jnp.asarray(1.0))
h = jax.hessian(loss)(jnp.asarray(1.0))
print("d loss / d theta:", float(g), " d2:", float(h))

# batched right-hand sides via plain vmap (the reference's batch mode 2)
B = np.stack([b, 2 * b, -b])
X = jax.vmap(lambda bb: spsolve(pattern, jnp.asarray(data), bb))(
    jnp.asarray(B))
print("batched solves:", X.shape)
