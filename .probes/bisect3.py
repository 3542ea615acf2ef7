import time, numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
n = 1466; nnz = 34220; F = 32
rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
cols = rng.integers(0, n, nnz).astype(np.int32)
Kf = (rng.standard_normal(nnz) + 1j * 0.01 * rng.standard_normal(nnz)).astype(np.complex64)
oms = np.linspace(0.5, 1.5, F).astype(np.float32)
B = (rng.standard_normal((F, n)) + 1j * rng.standard_normal((F, n))).astype(np.complex64)


def bench(name, f, *args):
    t0 = time.perf_counter(); u = f(*args); jax.block_until_ready(u)
    t1 = time.perf_counter(); u = f(*args); jax.block_until_ready(u)
    t2 = time.perf_counter()
    print(f'{name}: first={t1-t0:.1f}s steady={t2-t1:.4f}s', flush=True)


# D: scatter-add with indices as runtime ARGS
def fd(Kf, rj, cj):
    return jnp.zeros((n, n), Kf.dtype).at[rj, cj].add(Kf)

bench('D scatter arg-indices', jax.jit(fd), Kf, rows, cols)

# E: gather with table as runtime ARG
table = np.full(n * n, nnz, np.int32)
table[rows.astype(np.int64) * n + cols.astype(np.int64)] = np.arange(nnz)

def fe(Kf, tj):
    ext = jnp.concatenate([Kf, jnp.zeros(1, Kf.dtype)])
    return ext[tj].reshape(n, n)

bench('E gather arg-table', jax.jit(fe), Kf, table)
