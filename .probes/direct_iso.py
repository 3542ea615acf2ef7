import time, numpy as np, jax, jax.numpy as jnp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import to_dense

# real FEM matrices at bench size
acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
op = p.op
n = p.n_free
print('n_free', n, flush=True)

import numpy as np
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(p.parameters), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
M_flat = np.asarray(p.MInertia)

Kd = np.zeros((n, n), np.complex64)
Kd[op.pattern.rows, op.pattern.cols] += K_flat
Md = np.zeros((n, n), np.complex64)
Md[op.pattern.rows, op.pattern.cols] += M_flat

F = 64
oms = (2*np.pi*np.linspace(40, 600, F)).astype(np.float32)
rng = np.random.default_rng(0)
B = (rng.standard_normal((F, n)) + 1j*rng.standard_normal((F, n))).astype(np.complex64)

# variant 1: plain dense map solve (no scatter, no checkpoint)
def sweep1(Kd, Md, oms, B):
    def one(args):
        om, b = args
        return jnp.linalg.solve(Kd - om**2*Md, b)
    return jax.lax.map(one, (oms, B), batch_size=16)
f1 = jax.jit(sweep1)
t0=time.perf_counter(); u=f1(Kd, Md, oms, B); jax.block_until_ready(u)
t1=time.perf_counter(); u=f1(Kd, Md, oms, B); jax.block_until_ready(u)
t2=time.perf_counter()
print(f'v1 plain: first={t1-t0:.1f}s steady={t2-t1:.3f}s', flush=True)

# variant 2: with checkpoint
def sweep2(Kd, Md, oms, B):
    @jax.checkpoint
    def one(args):
        om, b = args
        return jnp.linalg.solve(Kd - om**2*Md, b)
    return jax.lax.map(one, (oms, B), batch_size=16)
f2 = jax.jit(sweep2)
t0=time.perf_counter(); u=f2(Kd, Md, oms, B); jax.block_until_ready(u)
t1=time.perf_counter()
print(f'v2 checkpoint: first={t1-t0:.1f}s', flush=True)

# variant 3: with scatter inside (our to_dense)
rows = jnp.asarray(op.pattern.rows); cols = jnp.asarray(op.pattern.cols)
Kf = jnp.asarray(K_flat.astype(np.complex64)); Mf = jnp.asarray(M_flat.astype(np.float32))
def sweep3(Kf, Mf, oms, B):
    Kd = to_dense(Kf, rows, cols, n)
    Md = to_dense(Mf, rows, cols, n).astype(Kd.dtype)
    def one(args):
        om, b = args
        return jnp.linalg.solve(Kd - om**2*Md, b)
    return jax.lax.map(one, (oms, B), batch_size=16)
f3 = jax.jit(sweep3)
t0=time.perf_counter(); u=f3(Kf, Mf, oms, B); jax.block_until_ready(u)
t1=time.perf_counter()
print(f'v3 scatter: first={t1-t0:.1f}s', flush=True)
