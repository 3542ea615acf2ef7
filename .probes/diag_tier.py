"""Convergence-vs-floor discrimination at a scale tier's resonance peak.

The scanned-peak FRF error grows with tier on the chip (3.2e-5 at n=46k,
3.6e-4 at n=82k) while the same code on CPU holds ~3e-7.  Two candidate
causes: (a) the Krylov/correction budget caps out, (b) the TPU's
non-exactly-rounded f64 SpMV noise amplified by the resonance.
``Problem.diagnoseSweep`` separates them: if the solves CONVERGE (>= 9
orders of residual progress / target reached) and the FRF is still off,
the error is the arithmetic floor, not the iteration budget.
"""
import os

import numpy as np

import plate_inverse_problem_tpu as pip

REFINE = float(os.environ.get("REFINE", "8"))

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
print(f"n_free={p.n_free}", flush=True)

# the scanned peak of the 512-pt sweep sits at 150.68 Hz at these tiers;
# bracket it plus off-peak controls
freqs = np.array([43.29, 148.0, 150.68, 153.0, 320.55, 600.0,
                  150.2, 151.2])
d = p.diagnoseSweep(freqs)
prog = d["residual_norm"] / d["initial_residual_norm"]
for i, f in enumerate(freqs):
    print(f"f={f:7.2f} Hz  rn={d['residual_norm'][i]:.2e}  "
          f"rn/rn0={prog[i]:.2e}  target={d['target'][i]:.2e}  "
          f"final_rn={d['final_residual_norm'][i]:.2e}  "
          f"converged={bool(d['converged'][i])}", flush=True)
print("all converged:", bool(d["converged"].all()), flush=True)
