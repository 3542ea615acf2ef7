"""band_mv f64 vs scatter spmv_flat f64 at the mg tier: batch scaling."""
import os, time
import numpy as np, jax, jax.numpy as jnp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat
from plate_inverse_problem_tpu.ops.band import flat_to_band, band_mv

REFINE = float(os.environ.get("REFINE", "4"))
acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
core, od = p.getFRCore()
n = p.n_free
lay = p._band_layout
print(f"n={n} nnz={p.op.pattern.nnz} b={lay.b} nb={lay.nb} bw={lay.bandwidth}", flush=True)
rows, cols = od['rows'], od['cols']
Kf = jnp.asarray(np.asarray(od['MIn'], np.float64))
rng = np.random.default_rng(0)

def timeit(name, f, *a, reps=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f'{name}: {dt:.2f} ms', flush=True)
    return dt

lin = jnp.asarray(lay.lin)
t0 = time.perf_counter()
Kband = jax.jit(lambda v: flat_to_band(v, lay, lin))(Kf); jax.block_until_ready(Kband)
print(f"flat_to_band f64 first: {time.perf_counter()-t0:.2f}s  band tensor {Kband.shape} {Kband.dtype} {Kband.nbytes/1e6:.0f} MB", flush=True)
timeit("flat_to_band f64", jax.jit(lambda v: flat_to_band(v, lay, lin)), Kf)

for B in (16, 64, 128):
    X = jnp.asarray(rng.standard_normal((B, n)))
    timeit(f"scatter f64 (B={B})", jax.jit(lambda X: spmv_flat(Kf, rows, cols, X, n)), X)
    timeit(f"band f64    (B={B})", jax.jit(lambda X: band_mv(Kband, X, lay)), X)
    X32 = X.astype(jnp.float32)
    timeit(f"band f32    (B={B})", jax.jit(lambda X: band_mv(Kband.astype(jnp.float32), X, lay)), X32)
