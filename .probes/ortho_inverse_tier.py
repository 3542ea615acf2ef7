"""North-star experiment: orthotropic GN inverse at a refine tier.

512-pt sweep, 5-parameter orthotropic material (E1, E2, G12, nu12, beta),
N GN steps with forward-mode Jacobians through the mixed engine.

TPU: PYTHONPATH=/root/repo:/root/.axon_site REFINE=8 python -u .probes/ortho_inverse_tier.py
Env: REFINE, NFREQ (512), NSTEPS (20), PRECOND (mg), TOL (engine refine_tol).
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.optimize import optimize_gauss_newton

refine = float(os.environ.get("REFINE", "4"))
F = int(os.environ.get("NFREQ", "512"))
n_steps = int(os.environ.get("NSTEPS", "20"))
precond = os.environ.get("PRECOND", "mg")

acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "orthotropic",
                       E1=200e9, E2=60e9, G12=30e9, nu12=0.25, beta=0.003)

t0 = time.time()
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
p = pip.Problem(geom, mat, acc, engine="mixed", precond=precond, f_max=600.0)
t1 = time.time()
print(f"init {t1-t0:.1f}s n_free={p.n_free}", flush=True)
core, od = p.getFRCore()
t2 = time.time()
print(f"host prep {t2-t1:.1f}s", flush=True)

freqs = np.linspace(40, 600, F)
theta = np.asarray(p.parameters)
frf = p.getFRFunction()
t3 = time.time()
y = np.asarray(frf(freqs, theta))
t4 = time.time()
y = np.asarray(frf(freqs, theta))
t5 = time.time()
print(f"sweep: compile+run {t4-t3:.1f}s steady {t5-t4:.2f}s "
      f"({F/(t5-t4):.1f} solves/s/chip)", flush=True)

resfn = p.getResidualFunction(freqs, y.astype(np.complex128), kind="log_afc")
th0 = theta * np.asarray([1.3, 0.75, 1.25, 0.8, 1.2])
t6 = time.time()
r, J = resfn.value_and_jac(th0)
jax.block_until_ready(J)
t7 = time.time()
print(f"GN r+J compile+run {t7-t6:.1f}s", flush=True)

t8 = time.time()
res = optimize_gauss_newton(resfn, th0, N_steps=n_steps, f_min=1e-14)
t9 = time.time()
rel = np.abs(np.asarray(res.x) - theta) / np.abs(theta)
print(f"{n_steps}-step orthotropic GN inverse: {t9-t8:.1f}s "
      f"(status {res.status}, f={float(res.f):.3e})", flush=True)
print("param rel err:", np.array2string(rel, precision=2), flush=True)
print(f"TIER RESULT n_free={p.n_free} sweep_steady_s={t5-t4:.2f} "
      f"inverse_s={t9-t8:.1f}", flush=True)
