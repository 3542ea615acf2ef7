"""refine_tol sweep at the bench tier: surplus accuracy (4.2e-8 measured at
refine_tol=3e-7) could be traded for throughput while staying under the
BASELINE 1e-6 gate.  Measures steady sweep + worst rel err vs f64 splu
(incl. the resonance peak) per tolerance, at nominal AND perturbed theta.
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES  # noqa: E402

TOLS = [float(t) for t in os.environ.get("TOLS", "3e-7,1e-6,3e-6").split(",")]
F = 512

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=1.0)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
freqs = np.linspace(40, 600, F)

p0 = pip.Problem(geom, mat, acc)
op = p0.op
n = p0.n_free
th0 = np.asarray(p0.parameters, np.float64)
th_pert = th0 * np.asarray([1.1, 0.95, 1.2])


def oracle_pts(th, idxs):
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        Av, Bv, Dv = (np.asarray(x)
                      for x in mat.get_ABD_transform(geom.height)(th, 0.0))
    K_flat = sum(Av[i] * op.mats["A" + s] + Bv[i] * op.mats["B" + s]
                 + Dv[i] * op.mats["D" + s]
                 for i, s in enumerate(MODULI_INDICES))
    bK = sum(Av[i] * op.lifts["A" + s] + Bv[i] * op.lifts["B" + s]
             + Dv[i] * op.lifts["D" + s]
             for i, s in enumerate(MODULI_INDICES))
    Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)),
                       shape=(n, n))
    Mc = sp.csc_matrix((np.asarray(p0.MInertia).astype(complex),
                        (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    fIn = np.asarray(p0.fInertia)

    def row(nm):
        R, r0 = op.readout[nm]
        return R.mean(axis=0), r0.mean()

    cu, ou = row("u"); cv, ov = row("v"); cw, ow = row("w")
    cwx, owx = row("wx"); cwy, owy = row("wy")
    eff = acc.effective_height * acc.height
    ts = acc.transverse_sensitivity
    out = {}
    for i in idxs:
        om = 2 * np.pi * freqs[i]
        u = spla.splu((Kc - om ** 2 * Mc).tocsc()).solve(bK - om ** 2 * fIn)
        uu = (cu - eff * cwx) @ u + (ou - eff * owx)
        vv = (cv - eff * cwy) @ u + (ov - eff * owy)
        ww = cw @ u + ow
        out[i] = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2
                         + abs(ww) ** 2)
    return out


for tol in TOLS:
    p = pip.Problem(geom, mat, acc, refine_tol=tol)
    fn = p.getFRFunction()
    fj = jnp.asarray(freqs)
    for label, th in (("nominal", th0), ("perturbed", th_pert)):
        tj = jnp.asarray(th, jnp.float64)
        t0 = time.perf_counter()
        fr = fn(fj, tj); jax.block_until_ready(fr)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            fr = fn(fj, tj)
        jax.block_until_ready(fr)
        dt = (time.perf_counter() - t0) / 5
        fr_np = np.asarray(fr)
        idxs = [3, int(np.argmax(fr_np)), F // 2, F - 1]
        oc = oracle_pts(th, idxs)
        rel = max(abs(fr_np[i] - oc[i]) / abs(oc[i]) for i in idxs)
        print(f"tol={tol:.0e} {label}: first={t_first:.1f}s sweep={dt*1e3:.1f}ms"
              f" -> {F/dt:.0f} solves/s, worst rel err {rel:.2e}", flush=True)
