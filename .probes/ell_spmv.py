"""ELL (padded-row) gather SpMV vs scatter-add SpMV on TPU, f64."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
op = p.op
n = p.n_free
rows, cols = op.pattern.rows, op.pattern.cols
data = np.asarray(p.MInertia)

# build ELL
import collections
counts = np.bincount(rows, minlength=n)
L = int(counts.max())
print('n', n, 'nnz', rows.size, 'max row nnz L =', L, flush=True)
cols_ell = np.zeros((n, L), np.int32)
data_ell = np.zeros((n, L))
fill = np.zeros(n, np.int64)
for s in range(rows.size):
    r = rows[s]
    cols_ell[r, fill[r]] = cols[s]
    data_ell[r, fill[r]] = data[s]
    fill[r] += 1

F = 512
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((F, n)))

def spmv_scatter(X):
    return spmv_flat(jnp.asarray(data), jnp.asarray(rows), jnp.asarray(cols), X, n)

de = jnp.asarray(data_ell)
ce = jnp.asarray(cols_ell)

def spmv_ell(X):
    # y[f, i] = sum_l X[f, ce[i, l]] * de[i, l]
    Xg = X[:, ce.reshape(-1)].reshape(F, n, L)
    return jnp.einsum('fil,il->fi', Xg, de)

def spmv_ell_chunk(X, blk=256):
    outs = []
    for i0 in range(0, n, blk):
        i1 = min(i0 + blk, n)
        Xg = X[:, ce[i0:i1].reshape(-1)].reshape(F, i1 - i0, L)
        outs.append(jnp.einsum('fil,il->fi', Xg, de[i0:i1]))
    return jnp.concatenate(outs, axis=1)

def timeit(name, f, *a):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = f(*a)
    jax.block_until_ready(o)
    print(f'{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms', flush=True)
    return o

y1 = timeit('scatter', jax.jit(spmv_scatter), X)
y2 = timeit('ell-gather', jax.jit(spmv_ell), X)
y3 = timeit('ell-chunked', jax.jit(spmv_ell_chunk), X)
print('agree:', float(jnp.abs(y1 - y2).max()), float(jnp.abs(y1 - y3).max()), flush=True)
