"""Round-3 tuning matrix at the bench tier (n=1466, 512 freqs, TPU).

Measures sweep time + worst rel err (nominal AND perturbed theta, incl.
resonance peaks) across (n_refine, k_cycle, _PRECOND_REFINE) with the
restarted f32-basis FGMRES.  Theta passed in f64 (split transforms).
"""
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
import plate_inverse_problem_tpu.ops.mixed as mixed
import scipy.sparse as sp, scipy.sparse.linalg as spla

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=1.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

F = 512
freqs = np.linspace(40, 600, F)

p0 = pip.Problem(geom, mat, acc)
op = p0.op; n = p0.n_free
th0 = np.asarray(p0.parameters, np.float64)
th_pert = th0 * np.asarray([1.1, 0.95, 1.2])

def oracle_for(th):
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(th, 0.0))
    K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
    bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
    M_flat = np.asarray(p0.MInertia); fIn = np.asarray(p0.fInertia)
    Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    def row(nm):
        R, r0 = op.readout[nm]; return R.mean(axis=0), r0.mean()
    cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
    eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity
    out = np.zeros(F)
    for i in range(F):
        om = 2*np.pi*freqs[i]
        u_full = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
        uu = (cu-eff*cwx)@u_full + (ou-eff*owx); vv = (cv-eff*cwy)@u_full + (ov-eff*owy); ww = cw@u_full + ow
        out[i] = np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2)
    return out

print('building oracles...', flush=True)
orc0 = oracle_for(th0)
orcp = oracle_for(th_pert)

# (n_refine, k_cycle, PRECOND_REFINE)
configs = [
    (20, 8, 1),
    (16, 8, 1),
    (16, 4, 1),
    (12, 6, 1),
    (12, 4, 1),
    (12, 4, 0),
    (8, 4, 1),
    (20, 20, 3),   # round-2 default shape for comparison (but f32 basis)
]

fj = jnp.asarray(freqs)
for nref, kc, pr in configs:
    mixed._PRECOND_REFINE = pr
    p = pip.Problem(geom, mat, acc, n_refine=nref, k_cycle=kc)
    fn = p.getFRFunction()
    t0 = time.perf_counter()
    fr = fn(fj, jnp.asarray(th0)); jax.block_until_ready(fr)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        fr = fn(fj, jnp.asarray(th0))
    jax.block_until_ready(fr)
    dt = (time.perf_counter()-t0)/3
    rel0 = np.max(np.abs(np.asarray(fr) - orc0)/np.abs(orc0))
    frp = np.asarray(fn(fj, jnp.asarray(th_pert)))
    relp = np.max(np.abs(frp - orcp)/np.abs(orcp))
    print(f'nref={nref} kc={kc} PR={pr}: compile={comp:.1f}s {dt*1e3:.1f} ms -> {F/dt:.0f} solves/s, rel0={rel0:.2e} relp={relp:.2e}', flush=True)
