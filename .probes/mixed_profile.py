"""Time breakdown of the mixed sweep: SpMV64 vs preconditioner GEMM vs band."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
core, od = p.getFRCore()
n = p.n_free
F = 512
rows, cols = od['rows'], od['cols']
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((F, n)))          # f64
X32 = X.astype(jnp.float32)
Kf = od['MIn']  # f64 flat data stand-in
invK = od['invK32']
W = od['W64']

def timeit(name, f, *a):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = f(*a)
    jax.block_until_ready(o)
    print(f'{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms', flush=True)

timeit('spmv64 (F=512)', jax.jit(lambda X: spmv_flat(Kf, rows, cols, X, n)), X)
timeit('precond GEMM f32 (F=512)', jax.jit(lambda X: X @ invK.T), X32)
timeit('band proj f64 (F=512, m=%d)' % W.shape[1], jax.jit(lambda X: (X @ W) @ W.T), X)

# whole sweep + per-refine scaling
fn = p.getFRFunction()
freqs = np.linspace(40, 600, F)
th = jnp.asarray(np.asarray(p.parameters, np.float32))
fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t0 = time.perf_counter()
for _ in range(3):
    fr = fn(jnp.asarray(freqs), th)
jax.block_until_ready(fr)
print(f'full sweep (n_refine={p.n_refine}): {(time.perf_counter()-t0)/3*1e3:.1f} ms', flush=True)

p2 = pip.Problem(geom, mat, acc, n_refine=4)
fn2 = p2.getFRFunction()
fr = fn2(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t0 = time.perf_counter()
for _ in range(3):
    fr = fn2(jnp.asarray(freqs), th)
jax.block_until_ready(fr)
print(f'full sweep (n_refine=4): {(time.perf_counter()-t0)/3*1e3:.1f} ms', flush=True)
