import time, numpy as np, jax, jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

rng = np.random.default_rng(0)
for n in (1466, 2048):
    A = rng.standard_normal((n, n)).astype(np.float32)
    M = (A @ A.T + n * np.eye(n)).astype(np.float32)
    K = (A + A.T).astype(np.float32)

    def red(M, K):
        L = jnp.linalg.cholesky(M)
        Y = solve_triangular(L, K, lower=True)
        C = solve_triangular(L, Y.T, lower=True).T
        return C

    f = jax.jit(red)
    t0 = time.perf_counter(); C = f(M, K); jax.block_until_ready(C)
    t1 = time.perf_counter(); C = f(M, K); jax.block_until_ready(C)
    t2 = time.perf_counter()
    print(f"chol+trsm n={n}: first={t1-t0:.1f}s steady={t2-t1:.4f}s", flush=True)

# small eigh (fixed 256) — the block-Jacobi inner kernel
B = rng.standard_normal((256, 256)).astype(np.float32)
B = B + B.T
g = jax.jit(jnp.linalg.eigh)
t0 = time.perf_counter(); o = g(B); jax.block_until_ready(o)
t1 = time.perf_counter(); o = g(B); jax.block_until_ready(o)
t2 = time.perf_counter()
print(f"eigh n=256: first={t1-t0:.1f}s steady={t2-t1:.4f}s", flush=True)
