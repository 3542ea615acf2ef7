"""SCALE.md data collector: one tier per run (env REFINE).

Measures: ctor/prep time, 512-pt sweep first+steady, accuracy vs f64 splu
(4 pts incl. the peak), GN r+J first+steady, and (env SPMV=1) the
one-apply scatter-vs-band f64 operator shootout at this tier's nnz.
Appends a JSON line to .probes/scale_results.jsonl.
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

REFINE = float(os.environ.get("REFINE", "4"))
DO_SPMV = os.environ.get("SPMV", "0") == "1"
DO_GN = os.environ.get("GN", "1") == "1"
F = int(os.environ.get("NFREQ", "512"))

rec = {"refine": REFINE, "freqs": F}
if os.environ.get("PIP_PALLAS_BAND") == "1":
    rec["pallas_band"] = True

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc, ozaki=(os.environ.get("PIP_OZAKI_OFF") != "1" and "auto" or False))
rec["ctor_s"] = round(time.perf_counter() - t0, 1)
rec["n_free"] = int(p.n_free)
rec["nnz"] = int(p.op.pattern.nnz)
print(f'n_free={p.n_free} nnz={p.op.pattern.nnz} ctor={rec["ctor_s"]}s',
      flush=True)

freqs = np.linspace(40, 600, F)
fn = p.getFRFunction()
th = jnp.asarray(np.asarray(p.parameters), jnp.float64)
fj = jnp.asarray(freqs)
# block_until_ready returns EARLY on the axon runtime (CLAUDE.md) — a
# segmented sweep dispatches all device calls in ~0 s.  Force a host
# readback of the full result so each timing covers real execution.
t0 = time.perf_counter(); fr = fn(fj, th); _ = np.asarray(fr)
t1 = time.perf_counter(); fr = fn(fj, th); _ = np.asarray(fr)
t2 = time.perf_counter()
rec["sweep_first_s"] = round(t1 - t0, 1)
rec["sweep_steady_s"] = round(t2 - t1, 2)
rec["solves_per_s"] = round(F / (t2 - t1), 1)
print(f'sweep: first={rec["sweep_first_s"]}s steady={rec["sweep_steady_s"]}s'
      f' -> {rec["solves_per_s"]} solves/s', flush=True)

# accuracy spot check vs f64 splu at the peak + 3 others
fr_np = np.asarray(fr)
op = p.op; n = p.n_free
with jax.default_device(jax.local_devices(backend='cpu')[0]):
    Av, Bv, Dv = (np.asarray(x) for x in
                  mat.get_ABD_transform(geom.height)(np.asarray(th), 0.0))
K_flat = sum(Av[i] * op.mats['A' + s] + Bv[i] * op.mats['B' + s]
             + Dv[i] * op.mats['D' + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts['A' + s] + Bv[i] * op.lifts['B' + s]
         + Dv[i] * op.lifts['D' + s] for i, s in enumerate(MODULI_INDICES))
rows_np = op.pattern.rows; cols_np = op.pattern.cols
Kc = sp.csc_matrix((K_flat, (rows_np, cols_np)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p.MInertia).astype(complex),
                    (rows_np, cols_np)), shape=(n, n))
fIn = np.asarray(p.fInertia)


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w')
cwx, owx = row('wx'); cwy, owy = row('wy')
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity
rel = 0.0
ipk = int(np.argmax(fr_np))
for i in [3, ipk, F // 2, F - 1]:
    om = 2 * np.pi * freqs[i]
    u = spla.splu((Kc - om ** 2 * Mc).tocsc()).solve(bK - om ** 2 * fIn)
    uu = (cu - eff * cwx) @ u + (ou - eff * owx)
    vv = (cv - eff * cwy) @ u + (ov - eff * owy)
    ww = cw @ u + ow
    ref_i = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)
    rel_i = abs(fr_np[i] - ref_i) / abs(ref_i)
    print(f'  f={freqs[i]:7.2f} Hz  rel err {rel_i:.2e}'
          f'{"  <-- peak" if i == ipk else ""}', flush=True)
    rel = max(rel, rel_i)
rec["worst_rel_err"] = float(rel)
rec["f_peak"] = round(float(freqs[ipk]), 2)
print(f'worst rel err vs f64 splu (4 pts incl. peak): {rel:.2e}', flush=True)

if DO_SPMV:
    # one-apply f64 operator shootout at this tier's nnz: flat scatter vs
    # RCM block-tridiagonal band GEMM (VERDICT task 5, nnz ~ 2e6 target)
    from plate_inverse_problem_tpu.ops.scatter import spmv_flat
    from plate_inverse_problem_tpu.ops.band import band_mv, flat_to_band

    core, od = p.getFRCore()
    lay = getattr(p, "_band_layout", None)
    if lay is None or "band_lin" not in od:
        print("SPMV shootout skipped: band layout inactive at this tier",
              flush=True)
        DO_SPMV = False

if DO_SPMV:
    rows_j = od["rows"]; cols_j = od["cols"]
    Kf64 = jnp.asarray(np.real(K_flat), jnp.float64)
    lin = od.get("band_lin")
    X = jnp.asarray(np.random.default_rng(0).standard_normal((16, n)))

    f_scat = jax.jit(lambda d, x: spmv_flat(d, rows_j, cols_j, x, n))
    o = f_scat(Kf64, X); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f_scat(Kf64, X)
    jax.block_until_ready(o)
    t_scat = (time.perf_counter() - t0) / 5

    Kb = jax.jit(lambda d: flat_to_band(d, lay, lin))(Kf64)
    jax.block_until_ready(Kb)
    f_band = jax.jit(lambda b, x: band_mv(b, x, lay))
    o2 = f_band(Kb, X); jax.block_until_ready(o2)
    t0 = time.perf_counter()
    for _ in range(5):
        o2 = f_band(Kb, X)
    jax.block_until_ready(o2)
    t_band = (time.perf_counter() - t0) / 5
    err = float(jnp.max(jnp.abs(o - o2)) / jnp.max(jnp.abs(o)))
    rec["spmv_scatter_ms"] = round(t_scat * 1e3, 1)
    rec["spmv_band_ms"] = round(t_band * 1e3, 1)
    rec["spmv_speedup"] = round(t_scat / t_band, 2)
    rec["spmv_agree"] = err
    print(f'f64 apply (16 lanes, nnz={rec["nnz"]}): scatter '
          f'{rec["spmv_scatter_ms"]} ms, band {rec["spmv_band_ms"]} ms '
          f'({rec["spmv_speedup"]}x), agree {err:.1e}', flush=True)

if DO_GN:
    ref = np.asarray(fr)
    resfn = p.getResidualFunction(freqs, ref, kind='log_afc')
    rec["jac_mode"] = resfn.jac_mode
    th2 = th * jnp.asarray([1.02, 1.01, 1.1])
    try:
        # forced host readbacks — see the sweep-timing note above
        t0 = time.perf_counter()
        r, J = resfn.value_and_jac(th2); _ = (np.asarray(r), np.asarray(J))
        t1 = time.perf_counter()
        r, J = resfn.value_and_jac(th2); _ = (np.asarray(r), np.asarray(J))
        t2 = time.perf_counter()
        rec["gn_first_s"] = round(t1 - t0, 1)
        rec["gn_steady_s"] = round(t2 - t1, 2)
        print(f'GN r+J ({F} pts, 3 params, {resfn.jac_mode}): '
              f'first={rec["gn_first_s"]}s '
              f'steady={rec["gn_steady_s"]}s/iter', flush=True)
    except Exception as e:  # record the sweep row even when GN fails
        rec["gn_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"GN FAILED: {rec['gn_error']}", flush=True)

with open(os.path.join(os.path.dirname(__file__),
                       "scale_results.jsonl"), "a") as fh:
    fh.write(json.dumps(rec) + "\n")
print("RECORD", json.dumps(rec), flush=True)
