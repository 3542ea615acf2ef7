"""Host-prep timing at the 100k-DOF tier: assembly, band basis, MG chain.

CPU-only (no TPU needed):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu python .probes/prep100k.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import plate_inverse_problem_tpu as pip

refine = float(os.environ.get("REFINE", "8"))
acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

t0 = time.time()
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
p = pip.Problem(geom, mat, acc, engine="mixed", precond="mg", f_max=600.0)
t1 = time.time()
print(f"Problem init (mesh+assembly): {t1-t0:.1f}s  n_free={p.n_free} "
      f"nnz={p.op.pattern.nnz}", flush=True)

core, od = p.getFRCore()
t2 = time.time()
print(f"getFRCore (band basis + MG chain): {t2-t1:.1f}s", flush=True)
print("mg levels:", p._mg_static["n"], flush=True)
print("band modes m =", od["W64"].shape[1], flush=True)
