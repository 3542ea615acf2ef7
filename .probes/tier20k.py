"""~12k-DOF tier on TPU: sweep throughput + GN iteration time."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=4.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc)
print(f'assembled n_free={p.n_free} in {time.perf_counter()-t0:.1f}s', flush=True)

F = 512
freqs = np.linspace(40, 600, F)
fn = p.getFRFunction()
th = jnp.asarray(np.asarray(p.parameters, np.float32))
t0 = time.perf_counter(); fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t1 = time.perf_counter(); fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t2 = time.perf_counter()
print(f'mixed n={p.n_free}: first={t1-t0:.1f}s (incl host band+precond) '
      f'steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s', flush=True)

# GN iteration timing on 200 compressed points
from plate_inverse_problem_tpu.io.compress import Compressor
ref = np.asarray(fr)
cf, cr = Compressor(freqs, ref.astype(complex), 200, 0)(200)
resfn = p.getResidualFunction(cf, cr, kind='log_afc')
th2 = th * jnp.asarray([1.02, 1.01, 1.1])
t0 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t1 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t2 = time.perf_counter()
print(f'GN residual+Jacobian (200 pts, 3 params): first={t1-t0:.1f}s '
      f'steady={t2-t1:.3f}s per iteration', flush=True)
