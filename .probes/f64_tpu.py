import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(0)
nnz, n, F = 34220, 1466, 8
rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
cols = rng.integers(0, n, nnz).astype(np.int32)
Kf64 = rng.standard_normal(nnz)
X = rng.standard_normal((F, n))

def spmv64(Kf, r, c, x):
    out = jnp.zeros(x.shape[:-1] + (n,), x.dtype)
    return out.at[..., r].add(Kf * x[..., c])

f = jax.jit(spmv64)
t0 = time.perf_counter()
y = f(Kf64, rows, cols, X); jax.block_until_ready(y)
t1 = time.perf_counter()
y = f(Kf64, rows, cols, X); jax.block_until_ready(y)
t2 = time.perf_counter()
y = np.asarray(y)
# numpy oracle
y_ref = np.zeros((F, n))
for i in range(F):
    np.add.at(y_ref[i], rows, Kf64 * X[i, cols])
err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
print(f"f64 spmv TPU: first={t1-t0:.1f}s steady={(t2-t1)*1e3:.1f}ms rel_err={err:.2e}", flush=True)
print("dtype:", y.dtype, flush=True)

# f64 elementwise complex arithmetic via split re/im
a = rng.standard_normal((n,)) + 0.0
b = rng.standard_normal((n,))
g = jax.jit(lambda a, b: a * b + jnp.sin(a))
z = np.asarray(g(a, b))
print("f64 elementwise ok:", np.abs(z - (a * b + np.sin(a))).max(), flush=True)
