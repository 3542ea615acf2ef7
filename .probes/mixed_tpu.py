"""Mixed engine on TPU: accuracy vs host f64 splu + speed."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc)   # auto -> mixed on TPU
print('engine:', p._engine(), 'n_free:', p.n_free,
      f'init={time.perf_counter()-t0:.1f}s', flush=True)

F = 512
freqs = np.linspace(40, 600, F)
fj = jnp.asarray(freqs.astype(np.float32))
th = jnp.asarray(np.asarray(p.parameters, np.float32))
fn = p.getFRFunction()
t0 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
t1 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
t2 = time.perf_counter()
print(f'mixed: first={t1-t0:.1f}s steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s '
      f'checksum={float(np.sum(np.abs(np.asarray(fr)))):.4f}', flush=True)

ref = np.asarray(fr)
loss = p.getLossFunction(freqs, ref, 'MSE_LOG_AFC')
th2 = th * jnp.asarray([1.02, 1.01, 1.1])
t0 = time.perf_counter(); v, g = loss.value_and_grad(th2); jax.block_until_ready(g)
t1 = time.perf_counter(); v, g = loss.value_and_grad(th2); jax.block_until_ready(g)
t2 = time.perf_counter()
print(f'loss+grad: first={t1-t0:.1f}s steady={t2-t1:.3f}s loss={float(v):.4e}', flush=True)

import scipy.sparse as sp, scipy.sparse.linalg as spla
op = p.op
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(p.parameters, np.float64), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
M_flat = np.asarray(p.MInertia); fIn = np.asarray(p.fInertia)
n = p.n_free
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(n, n))
def row(nm):
    R, r0 = op.readout[nm]; return R.mean(axis=0), r0.mean()
cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity
fr_np = np.asarray(fr)
idxs = [3, int(np.argmax(fr_np)), min(int(np.argmax(fr_np))+1, F-1), 256, 400, 511]
worst = 0.0
for i in idxs:
    om = 2*np.pi*freqs[i]
    u_full = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
    uu = (cu-eff*cwx)@u_full + (ou-eff*owx); vv = (cv-eff*cwy)@u_full + (ov-eff*owy); ww = cw@u_full + ow
    ref_i = np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2)
    rel = abs(fr_np[i]-ref_i)/abs(ref_i)
    worst = max(worst, rel)
    print(f'  f={freqs[i]:7.1f} Hz  fr={fr_np[i]:.6e}  oracle={ref_i:.6e}  rel={rel:.2e}', flush=True)
print(f'WORST rel err vs f64 splu: {worst:.2e}', flush=True)
