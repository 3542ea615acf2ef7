"""Performance harness: forward 3000-frequency sweep + compressed inverse.

Counterpart of the reference's examples/cpu_benchmark.py (sh_i template,
3000 freqs, 20-step GD inverse on 200 compressed points).
"""
# allow running from a source checkout: python examples/<name>.py
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from time import perf_counter as pf

import plate_inverse_problem_tpu as pip

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, "isotropic", E=200 * 1e9, G=75 * 1e9, beta=0.003)

p1 = pip.Problem(geom, mat, acc)

N_comp = 200
N_freq = 3000
freq = np.linspace(40, 600, N_freq)

t1 = pf()
fr = p1.solveForward(freq)
t2 = pf()
print(f"Forward problem time (incl. compile): {t2 - t1:.3f} seconds")

t1 = pf()
fr = p1.solveForward(freq)
fr.block_until_ready()
t2 = pf()
print(f"Forward problem time (steady state): {t2 - t1:.3f} seconds")
print(f"FR checksum: {np.sum(np.abs(np.asarray(fr))):.6f} "
      "(reference-mesh golden: 8416.439906)")

t1 = pf()
inv_res = p1.solveInverse(
    [0.1, 0.1, 0.2], "MSE_LOG_AFC", "gd", ref_fr=[freq, np.asarray(fr)],
    use_rel=True, compression=(True, N_comp), log=False, report=False,
    N_steps=20, h=0.001, f_min=1e-10,
)
t2 = pf()

expected = np.array([2.2e11, 8.25e10, p1.parameters[2] * 1.0])
print(f"Inverse problem time: {t2 - t1:.3f} seconds")
print("Recovered:", np.asarray(inv_res.x))
