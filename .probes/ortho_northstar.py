"""North-star measurement (BASELINE.md:26-28 / VERDICT r3 task 2).

End-to-end orthotropic inverse: 4 moduli + loss factor (E1, E2, G12,
nu12, beta) recovered by Gauss-Newton from multi-cut FRF data — three
SOL cuts at 0/90/45 degrees sharing one theta (the identifiable joint
formulation, ROADMAP.md "Identifiability") — each cut a 512-point sweep
at the REFINE tier, compressed to COMP points (io/compress alg 1, the
reference's resonance-centric selector).

Wall-clock phases reported separately: ctor (3 Problems), synthetic
data (3 sweeps + compression), GN compile (first value_and_jac), and
the inverse proper (N GN steps, post-compile).  Appends a JSON line to
.probes/northstar_results.jsonl.

TPU: PYTHONPATH=/root/repo:/root/.axon_site REFINE=4 python -u .probes/ortho_northstar.py
Env: REFINE (4), NFREQ (512), COMP (128), NSTEPS (12), PERT (0.35).
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.io.compress import Compressor
from plate_inverse_problem_tpu.optimize.second_order import (
    JointResidual, optimize_gauss_newton,
)

REFINE = float(os.environ.get("REFINE", "4"))
F = int(os.environ.get("NFREQ", "512"))
COMP = int(os.environ.get("COMP", "128"))
NSTEPS = int(os.environ.get("NSTEPS", "12"))
PERT = float(os.environ.get("PERT", "0.35"))

TRUE = np.array([120e9, 8.5e9, 4.5e9, 0.30, 0.006])
ANGLES = [0.0, 90.0, 45.0]

rec = {"refine": REFINE, "freqs": F, "comp": COMP, "nsteps": NSTEPS,
       "angles": ANGLES, "pert": PERT}

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)

t0 = time.perf_counter()
problems = []
for a in ANGLES:
    mat = pip.get_material(1550.0, "sol", angles=(a,),
                           E1=TRUE[0], E2=TRUE[1], G12=TRUE[2],
                           nu12=TRUE[3], beta=TRUE[4])
    problems.append(pip.Problem(geom, mat, acc))
rec["ctor_s"] = round(time.perf_counter() - t0, 1)
rec["n_free"] = int(problems[0].n_free)
print(f"3 cuts built: n_free={rec['n_free']} ctor={rec['ctor_s']}s",
      flush=True)

freqs = np.linspace(40.0, 600.0, F)
t0 = time.perf_counter()
datasets = []
cut_s = []
for p in problems:
    tc = time.perf_counter()
    fr = np.asarray(p.solveForward(freqs, TRUE))
    cut_s.append(round(time.perf_counter() - tc, 1))
    cf, cfr = Compressor(freqs, fr.astype(complex), F, 1)(COMP)
    datasets.append((cf, cfr))
rec["synth_s"] = round(time.perf_counter() - t0, 1)
rec["cut_sweep_s"] = cut_s
print(f"synthetic sweeps + compression to {COMP} pts: {rec['synth_s']}s "
      f"(per cut: {cut_s} — cuts share one executable since the trc hoist)",
      flush=True)

scaling = jnp.asarray(TRUE)
residuals = [
    p.getResidualFunction(cf, cfr, kind="log_afc", scaling_params=scaling)
    for p, (cf, cfr) in zip(problems, datasets)
]
joint = JointResidual(residuals)

rng = np.random.default_rng(0)
s0 = 1.0 + PERT * rng.uniform(-1.0, 1.0, size=5)
rec["s0"] = [round(float(x), 4) for x in s0]

t0 = time.perf_counter()
r, J = joint.value_and_jac(jnp.asarray(s0))
jax.block_until_ready(J)
rec["gn_compile_s"] = round(time.perf_counter() - t0, 1)
t0 = time.perf_counter()
r, J = joint.value_and_jac(jnp.asarray(s0))
jax.block_until_ready(J)
rec["gn_steady_s"] = round(time.perf_counter() - t0, 2)
print(f"joint GN r+J: first={rec['gn_compile_s']}s "
      f"steady={rec['gn_steady_s']}s/iter", flush=True)

t0 = time.perf_counter()
res = optimize_gauss_newton(joint, jnp.asarray(s0), N_steps=NSTEPS,
                            f_min=1e-16)
rec["inverse_s"] = round(time.perf_counter() - t0, 1)
x = np.asarray(res.x) * TRUE
rel_raw = np.abs(x - TRUE) / TRUE
# |FRF| is even in beta: +-beta are both exact minima of a magnitude
# residual (ROADMAP.md Identifiability) — score beta up to sign, and
# record the raw error too so a sign flip stays visible.
x_signfix = x.copy()
x_signfix[4] = abs(x_signfix[4])
rel = np.abs(x_signfix - TRUE) / TRUE
rec["param_rel_err_raw"] = [float(f"{e:.3e}") for e in rel_raw]
rec["status"] = str(res.status)
rec["loss_first"] = float(res.f_history[0])
rec["loss_final"] = float(res.f)
rec["param_rel_err"] = [float(f"{e:.3e}") for e in rel]
print(f"{NSTEPS}-step joint GN inverse: {rec['inverse_s']}s "
      f"(status {res.status}, loss {rec['loss_first']:.3e} -> "
      f"{rec['loss_final']:.3e})", flush=True)
print("param rel err:", np.array2string(rel, precision=3), flush=True)

with open(os.path.join(os.path.dirname(__file__),
                       "northstar_results.jsonl"), "a") as fh:
    fh.write(json.dumps(rec) + "\n")
print("RECORD", json.dumps(rec), flush=True)
