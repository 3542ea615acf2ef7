"""Accuracy vs n_refine at the resonance peak (TPU)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
import scipy.sparse as sp, scipy.sparse.linalg as spla

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

F = 512
freqs = np.linspace(40, 600, F)

# oracle once
p0 = pip.Problem(geom, mat, acc)
op = p0.op; n = p0.n_free
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(p0.parameters, np.float64), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
M_flat = np.asarray(p0.MInertia); fIn = np.asarray(p0.fInertia)
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(n, n))
def row(nm):
    R, r0 = op.readout[nm]; return R.mean(axis=0), r0.mean()
cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity

fr0 = np.asarray(p0.solveForward(freqs))
idxs = [3, int(np.argmax(fr0)), max(int(np.argmax(fr0))-1, 0), 256, 511]
oracle = {}
for i in idxs:
    om = 2*np.pi*freqs[i]
    u_full = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
    uu = (cu-eff*cwx)@u_full + (ou-eff*owx); vv = (cv-eff*cwy)@u_full + (ov-eff*owy); ww = cw@u_full + ow
    oracle[i] = np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2)

for nref in (4, 6, 8):
    p = pip.Problem(geom, mat, acc, n_refine=nref)
    fn = p.getFRFunction()
    th = jnp.asarray(np.asarray(p.parameters, np.float32))
    fr = fn(jnp.asarray(freqs), th); jax.block_until_ready(fr)
    t0 = time.perf_counter()
    for _ in range(3):
        fr = fn(jnp.asarray(freqs), th)
    jax.block_until_ready(fr)
    dt = (time.perf_counter()-t0)/3
    fr = np.asarray(fr)
    worst = max(abs(fr[i]-oracle[i])/abs(oracle[i]) for i in idxs)
    print(f'n_refine={nref}: {dt*1e3:.1f} ms -> {F/dt:.0f} solves/s, worst rel={worst:.2e}', flush=True)
