"""GN residual+Jacobian iteration timing at a given refine tier."""
import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip

refine = float(os.environ.get("TIER_REFINE", "2.0"))
acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=refine)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
print(f'n_free={p.n_free}', flush=True)

freqs = np.linspace(40, 600, 200)
fr = np.asarray(p.solveForward(freqs))
resfn = p.getResidualFunction(freqs, fr, kind='log_afc')
th2 = jnp.asarray(np.asarray(p.parameters, np.float32)) * jnp.asarray([1.02, 1.01, 1.1])
t0 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t1 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t2 = time.perf_counter()
print(f'GN r+J (200 pts, 3 params, n={p.n_free}): first={t1-t0:.1f}s '
      f'steady={t2-t1:.3f}s per iteration', flush=True)
