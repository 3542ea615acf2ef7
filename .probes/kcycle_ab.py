"""Bench-tier chip A/B: k_cycle 4 (new dense-tier default) vs 8 (old).

Round-3's judge bench recorded 3453.6 solves/s with k_cycle=8; the r5
default flip to 4 must not regress throughput.  Accuracy at 4 oracle
frequencies incl. the scanned peak.
"""
import os
import time

import numpy as np
import jax

if os.environ.get('CPU') == '1':
    jax.config.update('jax_platforms', 'cpu')

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES  # noqa: E402

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=1.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
F = 512
freqs = np.linspace(40, 600, F)
fj = jnp.asarray(freqs)

p0 = pip.Problem(geom, mat, acc)
op = p0.op
n = p0.n_free
th = jnp.asarray(np.asarray(p0.parameters), jnp.float64)
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(
        np.asarray(p0.parameters, np.float64), 0.0))
K_flat = sum(Av[i] * op.mats['A' + s] + Bv[i] * op.mats['B' + s]
             + Dv[i] * op.mats['D' + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts['A' + s] + Bv[i] * op.lifts['B' + s]
         + Dv[i] * op.lifts['D' + s] for i, s in enumerate(MODULI_INDICES))
M_flat = np.asarray(p0.MInertia)
fIn = np.asarray(p0.fInertia)
Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)),
                   shape=(n, n))


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row('u')
cv, ov = row('v')
cw, ow = row('w')
cwx, owx = row('wx')
cwy, owy = row('wy')
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity

th_pert = np.asarray(p0.parameters, np.float64) * np.array([1.15, 0.85, 1.2])


def build_oracle(theta):
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        Avv, Bvv, Dvv = (np.asarray(x) for x in
                         mat.get_ABD_transform(geom.height)(theta, 0.0))
    Kf = sum(Avv[i] * op.mats['A' + s] + Bvv[i] * op.mats['B' + s]
             + Dvv[i] * op.mats['D' + s] for i, s in enumerate(MODULI_INDICES))
    bKf = sum(Avv[i] * op.lifts['A' + s] + Bvv[i] * op.lifts['B' + s]
              + Dvv[i] * op.lifts['D' + s] for i, s in enumerate(MODULI_INDICES))
    Kcl = sp.csc_matrix((Kf, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    orc = {}
    for i in idxs:
        om = 2 * np.pi * freqs[i]
        u_full = spla.splu((Kcl - om ** 2 * Mc).tocsc()).solve(bKf - om ** 2 * fIn)
        uu = (cu - eff * cwx) @ u_full + (ou - eff * owx)
        vv = (cv - eff * cwy) @ u_full + (ov - eff * owy)
        ww = cw @ u_full + ow
        orc[i] = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2
                         + abs(ww) ** 2)
    return orc


fr0 = np.asarray(p0.solveForward(freqs))
frp = np.asarray(p0.solveForward(freqs, th_pert))
idxs = [3, int(np.argmax(fr0)), int(np.argmax(frp)), 256, 511]
oracle = build_oracle(np.asarray(p0.parameters, np.float64))
oracle_p = build_oracle(th_pert)

for nref, kc in ((16, 8), (32, 8), (48, 8)):
    p = pip.Problem(geom, mat, acc, n_refine=nref, k_cycle=kc)
    fn = p.getFRFunction()
    t0 = time.perf_counter()
    fr = fn(fj, th)
    jax.block_until_ready(fr)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        fr = fn(fj, th)
    jax.block_until_ready(fr)
    dt = (time.perf_counter() - t0) / 5
    frn = np.asarray(fr)
    rel = max(abs(frn[i] - oracle[i]) / abs(oracle[i]) for i in idxs)
    frpn = np.asarray(fn(fj, jnp.asarray(th_pert)))
    relp = max(abs(frpn[i] - oracle_p[i]) / abs(oracle_p[i]) for i in idxs)
    per = ' '.join(f'{i}:{abs(frpn[i] - oracle_p[i]) / abs(oracle_p[i]):.1e}'
                   for i in idxs)
    print(f'nref={nref} kc={kc}: first={comp:.1f}s {dt*1e3:.1f} ms -> '
          f'{F/dt:.0f} solves/s, rel0={rel:.2e} relp={relp:.2e} [{per}]',
          flush=True)
print('DONE', flush=True)
