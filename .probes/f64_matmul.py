import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(0)

# f64 matmul
for n in (256, 1024):
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, n))
    f = jax.jit(jnp.dot)
    t0 = time.perf_counter(); C = f(A, B); jax.block_until_ready(C)
    t1 = time.perf_counter(); C = f(A, B); jax.block_until_ready(C)
    t2 = time.perf_counter()
    err = np.abs(np.asarray(C) - A @ B).max() / np.abs(A @ B).max()
    print(f"f64 matmul n={n}: first={t1-t0:.1f}s steady={(t2-t1)*1e3:.2f}ms "
          f"rel_err={err:.2e} dtype={np.asarray(C).dtype}", flush=True)

# small f64 real solve
n = 128
A = rng.standard_normal((n, n)) + n * np.eye(n)
b = rng.standard_normal(n)
g = jax.jit(jnp.linalg.solve)
try:
    x = np.asarray(g(A, b))
    print("f64 solve(128): rel_err",
          np.abs(x - np.linalg.solve(A, b)).max() / np.abs(x).max(), flush=True)
except Exception as e:
    print("f64 solve failed:", str(e)[:120], flush=True)

# small f64 eigh
S = A + A.T
try:
    lam = np.asarray(jax.jit(jnp.linalg.eigvalsh)(S))
    print("f64 eigvalsh(128): err",
          np.abs(lam - np.linalg.eigvalsh(S)).max(), flush=True)
except Exception as e:
    print("f64 eigh failed:", str(e)[:120], flush=True)
