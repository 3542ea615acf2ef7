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


# A2: gather-table to_dense
table = np.full(n * n, nnz, np.int32)
table[rows.astype(np.int64) * n + cols.astype(np.int64)] = np.arange(nnz)
tj = jnp.asarray(table)

def fa2(Kf):
    ext = jnp.concatenate([Kf, jnp.zeros(1, Kf.dtype)])
    return ext[tj].reshape(n, n)

bench('A2 gather to_dense', jax.jit(fa2), Kf)

# B: dense sweep with checkpoint
Kd = np.zeros((n, n), np.complex64); Kd[rows, cols] += Kf
Kd = Kd + n * np.eye(n, dtype=np.complex64)
Md = np.eye(n, dtype=np.complex64)

def fb(Kd, Md, oms, B):
    @jax.checkpoint
    def one(args):
        om, b = args
        return jnp.linalg.solve(Kd - om**2 * Md, b)
    return jax.lax.map(one, (oms, B), batch_size=16)

bench('B checkpoint sweep', jax.jit(fb), Kd, Md, oms, B)

# C: full fused: gather-densify + checkpoint sweep
def fc(Kf, oms, B):
    Kd2 = fa2(Kf) + n * jnp.eye(n, dtype=Kf.dtype)
    @jax.checkpoint
    def one(args):
        om, b = args
        return jnp.linalg.solve(Kd2 - om**2 * Md, b)
    return jax.lax.map(one, (oms, B), batch_size=16)

bench('C gather+checkpoint sweep', jax.jit(fc), Kf, oms, B)
