"""Debug the resonance-peak accuracy at a scale tier: solve at the exact
512-grid peak frequency with increasing Krylov budgets and compare to f64
splu.  Env: REFINE (mesh), FPEAK (Hz), NREFS (comma list of n_refine)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

REFINE = float(os.environ.get("REFINE", "5"))
FPEAK = float(os.environ.get("FPEAK", "150.68"))
NREFS = [int(s) for s in os.environ.get("NREFS", "16,32").split(",")]

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

# f64 splu reference at the peak (host, once)
p0 = pip.Problem(geom, mat, acc, engine='mixed')
op = p0.op; n = p0.n_free
th = jnp.asarray(np.asarray(p0.parameters), jnp.float64)
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in
                  mat.get_ABD_transform(geom.height)(np.asarray(th), 0.0))
K_flat = sum(Av[i] * op.mats['A' + s] + Bv[i] * op.mats['B' + s]
             + Dv[i] * op.mats['D' + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts['A' + s] + Bv[i] * op.lifts['B' + s]
         + Dv[i] * op.lifts['D' + s] for i, s in enumerate(MODULI_INDICES))
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p0.MInertia).astype(complex),
                    (op.pattern.rows, op.pattern.cols)), shape=(n, n))
fIn = np.asarray(p0.fInertia)


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w')
cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity
om = 2 * np.pi * FPEAK
u = spla.splu((Kc - om ** 2 * Mc).tocsc()).solve(bK - om ** 2 * fIn)
uu = (cu - eff * cwx) @ u + (ou - eff * owx)
vv = (cv - eff * cwy) @ u + (ov - eff * owy)
ww = cw @ u + ow
ref = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)
print(f'splu ref at {FPEAK} Hz: {ref:.8e}', flush=True)

fj = jnp.asarray([FPEAK, FPEAK * 1.003, FPEAK * 0.997, 320.55])
for nr in NREFS:
    p = (p0 if nr == p0.n_refine
         else pip.Problem(geom, mat, acc, engine='mixed', n_refine=nr))
    fn = p.getFRFunction()
    t0 = time.perf_counter()
    fr = np.asarray(fn(fj, th))
    dt = time.perf_counter() - t0
    rel = abs(fr[0] - ref) / ref
    print(f'n_refine={nr}: peak rel err {rel:.2e}  ({dt:.1f}s incl. compile)',
          flush=True)
