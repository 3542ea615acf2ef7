"""Orthotropic inverse at a scale tier (BASELINE north-star evidence).

5-parameter orthotropic plate at env REFINE, 512-point sweep, synthetic
reference data from the true parameters, N GN steps from a perturbed
start.  Reports setup / compile / inverse wall times and the recovered
parameter errors; appends a JSON line to .probes/scale_results.jsonl
with kind='ortho_inverse'.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.optimize import optimize_gauss_newton

REFINE = float(os.environ.get("REFINE", "4"))
F = int(os.environ.get("NFREQ", "512"))
STEPS = int(os.environ.get("STEPS", "8"))

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
nu = 200e9 / (2 * 75e9) - 1
mat = pip.Orthotropic(7920.0, E1=210e9, E2=190e9, G12=75e9, nu12=nu,
                      beta=0.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc)
freqs = np.linspace(40, 600, F)
ref = np.asarray(p.solveForward(freqs))
t_setup = time.perf_counter() - t0
print(f'setup + synthetic data (n_free={p.n_free}): {t_setup:.1f}s',
      flush=True)

theta_true = np.asarray(p.parameters)
theta0 = theta_true * np.array([1.05, 0.95, 1.08, 1.0, 1.3])
scaling = jnp.asarray(theta0)
resfn = p.getResidualFunction(freqs, ref, kind='log_afc',
                              scaling_params=scaling)

t0 = time.perf_counter()
_ = resfn.value_and_jac(jnp.ones(5))
t_compile = time.perf_counter() - t0
print(f'r+J first call (compile): {t_compile:.1f}s', flush=True)

t0 = time.perf_counter()
res = optimize_gauss_newton(resfn, jnp.ones(5), N_steps=STEPS)
t_inv = time.perf_counter() - t0
x = np.asarray(res.x) * theta0
err = (x - theta_true) / theta_true
print(f'GN inverse ({STEPS} steps, 5 params, {F} pts, n={p.n_free}): '
      f'{t_inv:.1f}s status={res.status}', flush=True)
print('loss:', f'{float(res.f_history[0]):.3e} -> {float(res.f):.3e}',
      flush=True)
print('param rel err:', np.array2string(err, precision=3), flush=True)

rec = {"kind": "ortho_inverse", "refine": REFINE, "freqs": F,
       "n_free": int(p.n_free), "steps": STEPS,
       "setup_s": round(t_setup, 1), "compile_s": round(t_compile, 1),
       "inverse_s": round(t_inv, 1),
       "loss0": float(res.f_history[0]), "loss": float(res.f),
       "param_rel_err": [float(e) for e in err]}
with open(os.path.join(os.path.dirname(__file__),
                       "scale_results.jsonl"), "a") as fh:
    fh.write(json.dumps(rec) + "\n")
print("RECORD", json.dumps(rec), flush=True)
