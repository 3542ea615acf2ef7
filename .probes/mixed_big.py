"""Mixed engine at the ~5k-DOF tier + orthotropic trust-region inverse timing."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=2.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc)
print(f'init(n_free={p.n_free}) engine={p._engine()}: {time.perf_counter()-t0:.1f}s', flush=True)

F = 512
freqs = np.linspace(40, 600, F)
fn = p.getFRFunction()
th = jnp.asarray(np.asarray(p.parameters, np.float32))
t0 = time.perf_counter(); fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t1 = time.perf_counter(); fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
t2 = time.perf_counter()
print(f'mixed n={p.n_free}: first={t1-t0:.1f}s steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s', flush=True)

# orthotropic inverse: trust-region on 5 params, 200 compressed points
nu = 200e9/(2*75e9) - 1
mato = pip.Orthotropic(7920.0, E1=210e9, E2=190e9, G12=75e9, nu12=nu, beta=0.003)
po = pip.Problem(geom, mato, acc)
ref = np.asarray(po.solveForward(freqs))
t0 = time.perf_counter()
res = po.solveInverse([0.05, -0.05, 0.08, 0.0, 0.3], 'MSE_LOG_AFC', 'trust_region',
                      ref_fr=[freqs, ref], use_rel=True, use_scaling=True,
                      compression=(True, 200), report=False, log=False,
                      N_steps=10, delta_max=0.5)
t1 = time.perf_counter()
print(f'orthotropic TR inverse (10 steps, 200 pts, n={po.n_free}): {t1-t0:.1f}s', flush=True)
print('loss history:', [f'{float(v):.3e}' for v in res.f_history[:5]], '->', f'{float(res.f):.3e}', flush=True)
err = (np.asarray(res.x) - np.asarray(po.parameters)) / np.asarray(po.parameters)
print('param rel err after:', np.array2string(err, precision=2), flush=True)
