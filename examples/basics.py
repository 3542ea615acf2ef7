"""Simple script to check if everything works.

TPU-native counterpart of the reference's examples/basics.py (golden-value
end-to-end script): same plate (100 x 20 x 2 mm steel strip, AP1030
accelerometer at x = 10 mm on the symmetry line), same 50-point sweep, same
2-step gradient-descent inverse.

The reference's golden checksums (341.9363 / 91.7139 / 91.7141 / 0.4421,
basics.py:30-33) are tied to FreeFEM's exact coarse mesh; with this
framework's own mesher the sums differ (resonance peaks vs. the 50-point grid
shift by the discretisation delta).  This framework's own deterministic
golden values are asserted in tests/test_golden.py; this script prints both
for side-by-side inspection.  Measured on TPU v5e: FR 144.7110,
Initial 99.0879, After 99.0883, F_hist 0.1523.
"""
# allow running from a source checkout: python examples/<name>.py
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import plate_inverse_problem_tpu as pip

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None))
mat = pip.get_material(7920.0, "isotropic", E=200 * 1e9, G=75 * 1e9, beta=0.003)

p = pip.Problem(geom, mat, acc)

N = 50
freq = np.linspace(40, 600, N)
fr = p.solveForward(freq)

p0 = [0.1, 0.1, 0.2]

res = p.solveInverseLocal(
    p0, "MSE_LOG_AFC", "grad_descent", ref_fr=[freq, fr],
    compression=(False, N), use_rel=True, case_name="Example_",
    extra_info="Running `basics.py` example.\n",
    N_steps=2, h=0.001, f_min=1e-5,
)

hist = res.f_history
res = res.x

r1 = p.solveForward(freq, (np.array(p0) + 1) * p.parameters)
r2 = p.solveForward(freq, res)

print(f"FR: {np.sum(np.abs(fr)):.4f} (reference-mesh golden: 341.9363)")
print(f"Initial: {np.sum(np.abs(r1)):.4f} (reference-mesh golden: 91.7139)")
print(f"After: {np.sum(np.abs(r2)):.4f} (reference-mesh golden: 91.7141)")
print(f"F_hist: {np.sum(np.abs(hist)):.4f} (reference-mesh golden: 0.4421)")
