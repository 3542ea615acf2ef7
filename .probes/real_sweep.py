import time, numpy as np, jax, jax.numpy as jnp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.sweep import sweep_solve
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
op = p.op; n = p.n_free
print('n_free', n, flush=True)

Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(p.parameters), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES)).astype(np.complex64)
M_flat = np.asarray(p.MInertia, np.float32)
F = 64
oms = (2*np.pi*np.linspace(40, 600, F)).astype(np.float32)
rng = np.random.default_rng(0)
B = (rng.standard_normal((F, n)) + 1j*rng.standard_normal((F, n))).astype(np.complex64)
rows = jnp.asarray(op.pattern.rows); cols = jnp.asarray(op.pattern.cols)

f = jax.jit(lambda Kf, Mf, B, oms: sweep_solve(Kf, Mf, B, oms, rows, cols, n, engine='direct', chunk=16))
t0=time.perf_counter(); u = f(K_flat, M_flat, B, oms); jax.block_until_ready(u)
t1=time.perf_counter(); u = f(K_flat, M_flat, B, oms); jax.block_until_ready(u)
t2=time.perf_counter()
print(f'real direct sweep F={F}: first={t1-t0:.1f}s steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s', flush=True)
