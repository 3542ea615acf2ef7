"""Modal engine on TPU: accuracy vs scipy f64 oracle + speed vs direct."""
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

p_modal = pip.Problem(geom, mat, acc, engine='modal')
p_direct = pip.Problem(geom, mat, acc, engine='direct')
print('n_free', p_modal.n_free, flush=True)

F = 512
freqs = np.linspace(40, 600, F)
fj = jnp.asarray(freqs.astype(np.float32))
th = jnp.asarray(np.asarray(p_modal.parameters, np.float32))

for name, p in (('modal', p_modal), ('direct', p_direct)):
    fn = p.getFRFunction()
    t0 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
    t1 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
    t2 = time.perf_counter()
    print(f'{name}: first={t1-t0:.1f}s steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s; '
          f'checksum={float(np.sum(np.abs(np.asarray(fr)))):.4f}', flush=True)

# f64 oracle on host for 8 frequencies
import scipy.sparse as sp
import scipy.sparse.linalg as spla
op = p_modal.op
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(p_modal.parameters, np.float64), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
M_flat = np.asarray(p_modal.MInertia)
fIn = np.asarray(p_modal.fInertia)
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(p_modal.n_free,)*2)
Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(p_modal.n_free,)*2)

# readout rows (same as core)
def row(namek):
    R, r0 = op.readout[namek]
    return R.mean(axis=0), r0.mean()
cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity
idxs = [3, 100, 256, 400, 511]
fr_ref = []
for i in idxs:
    om = 2*np.pi*freqs[i]
    u_full = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
    uu = (cu - eff*cwx)@u_full + (ou - eff*owx)
    vv = (cv - eff*cwy)@u_full + (ov - eff*owy)
    ww = cw@u_full + ow
    fr_ref.append(np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2))
fr_ref = np.array(fr_ref)

for name, p in (('modal', p_modal), ('direct', p_direct)):
    fr = np.asarray(p.getFRFunction()(fj, th))[idxs]
    print(f'{name} vs f64 splu rel err: {np.abs(fr - fr_ref).max()/np.abs(fr_ref).max():.2e}', flush=True)
