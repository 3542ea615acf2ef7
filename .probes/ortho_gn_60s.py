"""BASELINE north star: orthotropic inverse (moduli + loss factor),
512-point sweep, one TPU chip — wall-clock demonstration."""
import time, numpy as np, jax, jax.numpy as jnp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.optimize import optimize_gauss_newton

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=2.0)
nu = 200e9 / (2 * 75e9) - 1
mat = pip.Orthotropic(7920.0, E1=210e9, E2=190e9, G12=75e9, nu12=nu, beta=0.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc)
freqs = np.linspace(40, 600, 512)
ref = np.asarray(p.solveForward(freqs))
t_setup = time.perf_counter() - t0
print(f'setup + synthetic data (n_free={p.n_free}): {t_setup:.1f}s', flush=True)

theta0 = np.asarray(p.parameters) * np.array([1.05, 0.95, 1.08, 1.0, 1.3])
scaling = jnp.asarray(theta0)
resfn = p.getResidualFunction(freqs, ref, kind='log_afc', scaling_params=scaling, freq_chunk=128)

# warm up the compile, then time the inverse proper
_ = resfn.value_and_jac(jnp.ones(5))
t0 = time.perf_counter()
res = optimize_gauss_newton(resfn, jnp.ones(5), N_steps=15)
t_inv = time.perf_counter() - t0
x = np.asarray(res.x) * np.asarray(theta0)
err = (x - np.asarray(p.parameters)) / np.asarray(p.parameters)
print(f'GN inverse (15 steps, 5 params, 512 pts, n={p.n_free}): {t_inv:.1f}s '
      f'status={res.status}', flush=True)
print('loss:', f'{float(res.f_history[0]):.3e} -> {float(res.f):.3e}', flush=True)
print('param rel err:', np.array2string(err, precision=3), flush=True)
