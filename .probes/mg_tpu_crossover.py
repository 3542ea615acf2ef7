"""Real-TPU probe: mixed engine throughput, precond='mg' vs 'dense'.

Run ONE at a time (device lock). Usage: python .probes/mg_tpu_crossover.py [mg|dense] [refine]
"""
import sys, time
import numpy as np
import plate_inverse_problem_tpu as pip

mode = sys.argv[1] if len(sys.argv) > 1 else "mg"
refine = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
geom = pip.Geometry("sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
t0 = time.time()
p = pip.Problem(geom, mat, acc, engine="mixed", precond=mode)
print(f"setup {mode}: n_free={p.n_free}  {time.time()-t0:.1f}s", flush=True)

freqs = np.linspace(60.0, 600.0, 512)
fr = p.getFRFunction()
theta = np.asarray(p.parameters)
t0 = time.time(); y = np.asarray(fr(freqs, theta)); t1 = time.time()
t0 = time.time(); y = np.asarray(fr(freqs, theta)); t2 = time.time()
print(f"{mode} refine={refine} n={p.n_free}: compile+run {t1-t0:.2f}s, steady {t2-t0:.3f}s "
      f"= {512/(t2-t0):.0f} solves/s, finite={np.all(np.isfinite(y))}", flush=True)
