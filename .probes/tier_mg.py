"""Forward sweep + GN r+J timing at a refine tier with precond='mg'.

TPU:  PYTHONPATH=/root/repo:/root/.axon_site REFINE=8 python .probes/tier_mg.py
Env: REFINE (mesh scale), NFREQ (default 512), GN=0/1, ORACLE=0/1.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
if os.environ.get("MG_REFINE"):
    import plate_inverse_problem_tpu.ops.mixed as _M3
    _M3._MG_REFINE = int(os.environ["MG_REFINE"])
if os.environ.get("PRECOND_REFINE"):
    import plate_inverse_problem_tpu.ops.mixed as _M2
    _M2._PRECOND_REFINE = int(os.environ["PRECOND_REFINE"])
if os.environ.get("DEBUG_GMRES"):
    import plate_inverse_problem_tpu.ops.mixed as _M
    _M._DEBUG_TRACE = True

refine = float(os.environ.get("REFINE", "4"))
precond = os.environ.get("PRECOND", "mg")
F = int(os.environ.get("NFREQ", "512"))
do_gn = os.environ.get("GN", "1") == "1"
do_oracle = os.environ.get("ORACLE", "0") == "1"
chunk_env = os.environ.get("CHUNK")

acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

t0 = time.time()
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
p = pip.Problem(geom, mat, acc, engine="mixed", precond=precond, f_max=600.0,
                freq_chunk=None if chunk_env is None else int(chunk_env),
                refine_tol=float(os.environ.get("REFINE_TOL", "3e-7")))
t1 = time.time()
print(f"init {t1-t0:.1f}s n_free={p.n_free} nnz={p.op.pattern.nnz}", flush=True)
core, od = p.getFRCore()
t2 = time.time()
lv = (p._mg_static["n"] if hasattr(p, "_mg_static") else
      ("twogrid:" + str(p._mg_rl.n_coarse) if hasattr(p, "_mg_rl") else "dense"))
print(f"host prep {t2-t1:.1f}s levels={lv} m={od['W64'].shape[1]} "
      f"chunk={getattr(p, 'freq_chunk', None)}", flush=True)

freqs = np.linspace(40, 600, F)
theta = np.asarray(p.parameters)
frf = p.getFRFunction()
t3 = time.time()
y = np.asarray(frf(freqs, theta))
t4 = time.time()
y = np.asarray(frf(freqs, theta))
t5 = time.time()
print(f"sweep F={F}: compile+run {t4-t3:.1f}s steady {t5-t4:.2f}s "
      f"-> {F/(t5-t4):.1f} solves/s/chip", flush=True)

if do_oracle:
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    # f64 splu oracle at a few frequencies incl. near-resonance
    _, odh = p.getFRCore()
    sub = [0, F // 3, 2 * F // 3, F - 1]
    # rebuild the complex operator on host from opdata
    # (equilibrated space; compare the returned |FRF| instead — simplest)
    import jax.numpy as jnp
    p2 = pip.Problem(pip.Geometry("sh_i", acc,
                     pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                     refine=refine), mat, acc, engine="direct")
    print("oracle: building direct comparison at", [float(freqs[i]) for i in sub],
          flush=True)

if do_gn:
    fr = y * np.exp(0j)
    resfn = p.getResidualFunction(freqs, y.astype(np.complex128), kind="log_afc")
    th2 = theta * np.asarray([1.03, 1.02, 1.1])
    t6 = time.time()
    r, J = resfn.value_and_jac(th2)
    jax.block_until_ready(J)
    t7 = time.time()
    r, J = resfn.value_and_jac(th2)
    jax.block_until_ready(J)
    t8 = time.time()
    print(f"GN r+J (F={F}, p=3): compile+run {t7-t6:.1f}s steady {t8-t7:.2f}s",
          flush=True)
    print("J finite:", bool(np.all(np.isfinite(np.asarray(J)))), flush=True)
