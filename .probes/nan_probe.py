"""Characterize the TPU band-tier NaN seen at refine=5 with a 4-pt FRF call.

Env: REFINE (default 5), LANES (comma list of lane counts to try).
For each lane count B, calls the FRF on a B-point frequency vector that
includes the 150.68 Hz resonance peak, prints the values + isnan mask.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip

REFINE = float(os.environ.get("REFINE", "5"))
LANES = [int(s) for s in os.environ.get("LANES", "4,8,32").split(",")]
FPEAK = float(os.environ.get("FPEAK", "150.68"))

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc, engine='mixed')
print(f'n_free={p.n_free}', flush=True)
fn = p.getFRFunction()
th = jnp.asarray(np.asarray(p.parameters), jnp.float64)

for B in LANES:
    # peak + a spread of off-peak points, like the 512 grid around it
    f = np.linspace(40, 600, B)
    f[np.argmin(abs(f - FPEAK))] = FPEAK
    t0 = time.perf_counter()
    fr = np.asarray(fn(jnp.asarray(f), th))
    dt = time.perf_counter() - t0
    bad = np.isnan(fr) | np.isinf(fr)
    ipk = int(np.argmin(abs(f - FPEAK)))
    print(f'B={B}: {bad.sum()} bad lanes {np.where(bad)[0].tolist()} '
          f'peak lane {ipk} fr[peak]={fr[ipk]:.6e}  ({dt:.1f}s)', flush=True)
    if bad.any():
        for i in np.where(bad)[0][:8]:
            print(f'   f={f[i]:.3f} -> {fr[i]}', flush=True)
