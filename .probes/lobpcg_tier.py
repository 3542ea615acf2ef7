"""Scale-tier A/B of the band-basis builders: ARPACK host shift-invert vs
device LOBPCG (ops/lobpcg.py), at the band+two-grid tier.

Env:
  NY       mesh refinement (default 8 -> n~21k)
  BACKEND  'cpu' to force the CPU backend (default: whatever axon pins)

Reports ctor time for basis='arpack' vs basis='lobpcg' (everything else
identical) and the FRF agreement between the two at 4 frequencies
including the scanned |FRF| peak.
"""
import os
import time

import numpy as np

if os.environ.get("BACKEND", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax

import plate_inverse_problem_tpu as pip

NY = int(os.environ.get("NY", "8"))

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    ny=NY)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

results = {}
for basis in ("arpack", "lobpcg"):
    t0 = time.time()
    p = pip.Problem(geom, mat, acc, engine="mixed", basis=basis)
    core, od = p.getFRCore()   # triggers _mixed_core (basis build included)
    ctor = time.time() - t0
    results[basis] = dict(p=p, ctor=ctor, m=int(od["W64"].shape[1]))
    print(f"{basis}: n={p.n_free} ctor={ctor:.1f}s m={results[basis]['m']}",
          flush=True)

# coarse scan for the peak, then compare the two FRFs there + 3 points
p_a = results["arpack"]["p"]
p_l = results["lobpcg"]["p"]
scan = np.linspace(40.0, 600.0, 57)
fr_fn_a = p_a.getFRFunction()
th = np.asarray(p_a.parameters)
t0 = time.time()
fr_scan = np.asarray(fr_fn_a(scan, th))
print(f"arpack 57-pt scan {time.time()-t0:.1f}s", flush=True)
peak = scan[np.argmax(np.abs(fr_scan))]
freqs = np.array([47.0, peak, 333.0, 585.0])

fr_a = np.asarray(fr_fn_a(freqs, th))
t0 = time.time()
fr_l = np.asarray(p_l.getFRFunction()(freqs, th))
print(f"lobpcg 4-pt sweep {time.time()-t0:.1f}s", flush=True)
rel = np.abs(fr_l - fr_a) / np.abs(fr_a)
print(f"peak at {peak:.1f} Hz; worst rel diff lobpcg vs arpack: "
      f"{rel.max():.2e}", flush=True)
print("PROBE_RESULT "
      f"{{\"n\": {p_a.n_free}, \"arpack_ctor_s\": "
      f"{results['arpack']['ctor']:.1f}, \"lobpcg_ctor_s\": "
      f"{results['lobpcg']['ctor']:.1f}, \"rel_diff\": {rel.max():.2e}}}",
      flush=True)
