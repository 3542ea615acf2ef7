"""Convergence-vs-floor discrimination at the 104k scanned peak.

The round-4 104k chip row measured 2.8e-4 rel err at the scanned |FRF|
peak (150.68 Hz) — ~10x above the extrapolated arithmetic floor (CPU f64
floor 1.0-1.5e-6 x the measured 15-20x device per-op gap ~ 2e-5).  This
probe discriminates: solve 3 frequencies (off-peak / peak / mid) under
increasing Krylov budgets (n_refine 16 -> 32 -> 48) against one shared
f64 splu oracle per frequency.

* errors shrink with budget  -> convergence-limited: raise the default
  n_refine (or the amp-aware tol) at the >=100k tier;
* errors stay put            -> the device arithmetic floor is simply
  higher at kappa ~ h^-4 than the 21k-calibrated model predicted.

TPU: PYTHONPATH=/root/repo:/root/.axon_site python -u .probes/peak_budget_104k.py
Env: REFINE (9), BUDGETS ("16,32,48"), FREQS ("43.29,150.68,320.55").
Appends a JSON line to .probes/peak_budget_results.jsonl.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

REFINE = float(os.environ.get("REFINE", "9"))
BUDGETS = [int(x) for x in os.environ.get("BUDGETS", "16,32,48").split(",")]
FREQS = [float(x) for x in
         os.environ.get("FREQS", "43.29,150.68,320.55").split(",")]

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)

rec = {"refine": REFINE, "freqs": FREQS, "budgets": BUDGETS}

# ---- shared splu oracle (host, once per frequency) -----------------------
p0 = pip.Problem(geom, mat, acc)
rec["n_free"] = int(p0.n_free)
print(f"n_free={p0.n_free} nnz={p0.op.pattern.nnz}", flush=True)
op = p0.op
n = p0.n_free
th = np.asarray(p0.parameters)
with jax.default_device(jax.local_devices(backend="cpu")[0]):
    Av, Bv, Dv = (np.asarray(x) for x in
                  mat.get_ABD_transform(geom.height)(th, 0.0))
K_flat = sum(Av[i] * op.mats["A" + s] + Bv[i] * op.mats["B" + s]
             + Dv[i] * op.mats["D" + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts["A" + s] + Bv[i] * op.lifts["B" + s]
         + Dv[i] * op.lifts["D" + s] for i, s in enumerate(MODULI_INDICES))
rows_np = op.pattern.rows
cols_np = op.pattern.cols
Kc = sp.csc_matrix((K_flat, (rows_np, cols_np)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p0.MInertia).astype(complex),
                    (rows_np, cols_np)), shape=(n, n))
fIn = np.asarray(p0.fInertia)


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row("u"); cv, ov = row("v"); cw, ow = row("w")
cwx, owx = row("wx"); cwy, owy = row("wy")
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity

oracle = {}
for f in FREQS:
    om = 2 * np.pi * f
    t0 = time.perf_counter()
    u = spla.splu((Kc - om ** 2 * Mc).tocsc()).solve(bK - om ** 2 * fIn)
    uu = (cu - eff * cwx) @ u + (ou - eff * owx)
    vv = (cv - eff * cwy) @ u + (ov - eff * owy)
    ww = cw @ u + ow
    oracle[f] = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2
                        + abs(ww) ** 2)
    print(f"oracle f={f:7.2f}: |fr|={oracle[f]:.6e} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

# ---- device solves under increasing budgets ------------------------------
fj = jnp.asarray(np.asarray(FREQS))
out_rows = []
for nb in BUDGETS:
    p = p0 if nb == p0.n_refine else pip.Problem(geom, mat, acc, n_refine=nb)
    fn = p.getFRFunction()
    t0 = time.perf_counter()
    fr = np.asarray(fn(fj, jnp.asarray(th, jnp.float64)))
    dt = time.perf_counter() - t0
    errs = {f"{f:.2f}": float(abs(fr[i] - oracle[f]) / abs(oracle[f]))
            for i, f in enumerate(FREQS)}
    out_rows.append({"n_refine": nb, "errs": errs, "t_s": round(dt, 1)})
    print(f"n_refine={nb:3d}: " + "  ".join(
        f"{k} Hz -> {v:.2e}" for k, v in errs.items()), flush=True)

rec["rows"] = out_rows
with open(os.path.join(os.path.dirname(__file__),
                       "peak_budget_results.jsonl"), "a") as fh:
    fh.write(json.dumps(rec) + "\n")
print("RECORD", json.dumps(rec), flush=True)
