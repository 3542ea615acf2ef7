"""Round-3 scale-tier measurement: sweep throughput, accuracy vs f64 splu,
GN r+J iteration time, at a given refine level (env REFINE, default 4).

Also A/Bs basis_f32 on the mg/band tier (env BASIS, '' = tier default).
"""
import os, time
import numpy as np, jax, jax.numpy as jnp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
import scipy.sparse as sp, scipy.sparse.linalg as spla

REFINE = float(os.environ.get("REFINE", "4"))
BASIS = os.environ.get("BASIS", "")
basis_f32 = None if BASIS == "" else BASIS == "1"
NREF = int(os.environ.get("NREF", "16"))

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc, n_refine=NREF, basis_f32=basis_f32)
t_ctor = time.perf_counter() - t0
print(f'assembled+prepped n_free={p.n_free} nnz={p.op.pattern.nnz} '
      f'in {t_ctor:.1f}s (precond={getattr(p, "_precond_resolved", "?")})', flush=True)

F = 512
freqs = np.linspace(40, 600, F)
fn = p.getFRFunction()
th = jnp.asarray(np.asarray(p.parameters), jnp.float64)
fj = jnp.asarray(freqs)
t0 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
t1 = time.perf_counter(); fr = fn(fj, th); jax.block_until_ready(fr)
t2 = time.perf_counter()
print(f'sweep n={p.n_free}: first={t1-t0:.1f}s steady={t2-t1:.2f}s '
      f'-> {F/(t2-t1):.1f} solves/s', flush=True)

# accuracy spot check vs f64 splu at the peak + 2 others
fr_np = np.asarray(fr)
op = p.op; n = p.n_free
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(np.asarray(th), 0.0))
K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p.MInertia).astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(n, n))
fIn = np.asarray(p.fInertia)
def row(nm):
    R, r0 = op.readout[nm]; return R.mean(axis=0), r0.mean()
cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity
rel = 0.0
for i in [3, int(np.argmax(fr_np)), F//2, F-1]:
    om = 2*np.pi*freqs[i]
    u = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
    uu = (cu-eff*cwx)@u + (ou-eff*owx); vv = (cv-eff*cwy)@u + (ov-eff*owy); ww = cw@u + ow
    ref_i = np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2)
    r = abs(fr_np[i] - ref_i)/abs(ref_i)
    rel = max(rel, r)
print(f'worst rel err vs f64 splu (4 pts incl. peak): {rel:.2e}', flush=True)

# GN residual+Jacobian time, 512 pts, 3 params
ref = np.asarray(fr)
resfn = p.getResidualFunction(freqs, ref.astype(complex) if np.iscomplexobj(ref) else ref, kind='log_afc')
th2 = th * jnp.asarray([1.02, 1.01, 1.1])
t0 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t1 = time.perf_counter(); r, J = resfn.value_and_jac(th2); jax.block_until_ready(J)
t2 = time.perf_counter()
print(f'GN r+J (512 pts, 3 params): first={t1-t0:.1f}s steady={t2-t1:.2f}s/iter', flush=True)
