"""Scatter SpMV batch scaling at bench tier."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=1.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
core, od = p.getFRCore()
n = p.n_free
rows, cols = od['rows'], od['cols']
Kf = jnp.asarray(np.asarray(od['MIn'], np.float64))
rng = np.random.default_rng(0)

def timeit(name, f, *a, reps=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms', flush=True)

for B in (256, 512, 768, 1024, 2048):
    X = jnp.asarray(rng.standard_normal((B, n)))
    timeit(f'spmv_flat f64 ({B}, n)', jax.jit(lambda X: spmv_flat(Kf, rows, cols, X, n)), X)

# batch axis LAST layout: x (n, B), contrib (nnz, B), scatter over axis 0
def spmv_T(data, x):
    contrib = data[:, None] * x[cols, :]
    out = jnp.zeros((n, x.shape[1]), contrib.dtype)
    return out.at[rows, :].add(contrib)
for B in (512, 1024):
    Xt = jnp.asarray(rng.standard_normal((n, B)))
    timeit(f'spmv_T f64 (n, {B})', jax.jit(lambda X: spmv_T(Kf, X)), Xt)

# two stacked ops via one call on (2B, n) vs two calls on (B, n)
X = jnp.asarray(rng.standard_normal((512, n)))
Mf = Kf * 1.5
def two_calls(X):
    return spmv_flat(Kf, rows, cols, X, n), spmv_flat(Mf, rows, cols, X, n)
timeit('2 calls (512, n) each', jax.jit(two_calls), X)
