"""CPU pre-validation of the 20k-tier accuracy (band+mg mixed engine) vs
f64 splu at a scanned resonance peak + 3 other points."""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES  # noqa: E402

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=float(__import__("os").environ.get("REFINE", "4")))
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
t0 = time.perf_counter()
import os as _os
_kw = {}
if _os.environ.get("NREFINE"):
    _kw["n_refine"] = int(_os.environ["NREFINE"])
if _os.environ.get("RTOL"):
    _kw["refine_tol"] = float(_os.environ["RTOL"])
p = pip.Problem(geom, mat, acc, engine="mixed", **_kw)
print(f"ctor {time.perf_counter()-t0:.0f}s n={p.n_free}", flush=True)
t0 = time.perf_counter()
core, od = p.getFRCore()
print(f"prep {time.perf_counter()-t0:.0f}s precond={p._resolve_precond() if hasattr(p,'_resolve_precond') else '?'} "
      f"band={p._band_layout is not None}", flush=True)

theta = jnp.asarray(np.asarray(p.parameters), jnp.float64)
fn = p.getFRFunction()
scan = np.linspace(40.0, 600.0, 29)
t0 = time.perf_counter()
fr_scan = np.asarray(fn(jnp.asarray(scan), theta))
print(f"29-pt scan {time.perf_counter()-t0:.0f}s", flush=True)
f_peak = scan[int(np.argmax(np.abs(fr_scan)))]
freqs = np.array([f_peak, 123.4, 456.7, 592.1])
fr = np.asarray(fn(jnp.asarray(freqs), theta))

op = p.op
n = p.n_free
Av, Bv, Dv = (np.asarray(x)
              for x in mat.get_ABD_transform(geom.height)(np.asarray(theta), 0.0))
K_flat = sum(Av[i] * op.mats["A" + s] + Bv[i] * op.mats["B" + s]
             + Dv[i] * op.mats["D" + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts["A" + s] + Bv[i] * op.lifts["B" + s]
         + Dv[i] * op.lifts["D" + s] for i, s in enumerate(MODULI_INDICES))
rows, cols = op.pattern.rows, op.pattern.cols
Kc = sp.csc_matrix((K_flat, (rows, cols)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p.MInertia).astype(complex), (rows, cols)),
                   shape=(n, n))
fIn = np.asarray(p.fInertia)


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row("u"); cv, ov = row("v"); cw, ow = row("w")
cwx, owx = row("wx"); cwy, owy = row("wy")
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity
worst = 0.0
for i, f in enumerate(freqs):
    om = 2 * np.pi * f
    u = spla.splu((Kc - om ** 2 * Mc).tocsc()).solve(bK - om ** 2 * fIn)
    uu = (cu - eff * cwx) @ u + (ou - eff * owx)
    vv = (cv - eff * cwy) @ u + (ov - eff * owy)
    ww = cw @ u + ow
    ref = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)
    rel = abs(fr[i] - ref) / abs(ref)
    worst = max(worst, rel)
    print(f"f={f:7.2f} Hz  rel err {rel:.2e}{'  <-- peak' if i == 0 else ''}",
          flush=True)
print(f"WORST {worst:.2e} ({'PASS' if worst <= 1e-6 else 'FAIL'} vs 1e-6)",
      flush=True)
