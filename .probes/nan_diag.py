"""Two-part chip diagnostic at the refine=5 band tier (n=32420):
1. B=4 peak call with PIP_MIXED_DEBUG=1 set by the caller -> localize NaN.
2. n_refine=32 Problem, B=8 peak call -> budget-vs-stall at the peak.
Env: PART=1|2|both
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip

PART = os.environ.get("PART", "both")
FPEAK = 150.68
SPLU_REF = 4.49486567e+02  # f64 splu readout at 150.68 Hz, refine=5 (peak5b.log)

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=5.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
th = None

if PART in ("1", "both"):
    p = pip.Problem(geom, mat, acc, engine='mixed')
    fn = p.getFRFunction()
    th = jnp.asarray(np.asarray(p.parameters), jnp.float64)
    fj = jnp.asarray([FPEAK, FPEAK * 1.003, FPEAK * 0.997, 320.55])
    fr = np.asarray(fn(fj, th))
    print(f'PART1 B=4 default budget: fr={fr}', flush=True)

if PART in ("2", "both"):
    p2 = pip.Problem(geom, mat, acc, engine='mixed', n_refine=32)
    fn2 = p2.getFRFunction()
    th = jnp.asarray(np.asarray(p2.parameters), jnp.float64)
    f8 = np.linspace(40, 600, 8)
    f8[1] = FPEAK
    t0 = time.perf_counter()
    fr2 = np.asarray(fn2(jnp.asarray(f8), th))
    dt = time.perf_counter() - t0
    rel = abs(fr2[1] - SPLU_REF) / SPLU_REF
    print(f'PART2 B=8 n_refine=32: peak={fr2[1]:.6e} rel err {rel:.2e} '
          f'({dt:.1f}s)', flush=True)
