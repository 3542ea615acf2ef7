"""Full golden-parity study (docs/GOLDEN_PARITY.md) — CPU, ~15 min.

Produces every number quoted in the doc: Richardson tables, Ritz bounds,
reference-density Delaunay realizations, checksum-vs-f0 sensitivity, the
one-shift consistency check, and the sh_i resolved-peak convergence.
Run from the repo root:  PYTHONPATH=. python .probes/golden_parity_study.py
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import conftest  # noqa: F401  (CPU backend, x64)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.diagnostics.parity import (
    modal_frf_expansion, frf_from_expansion, resonances_hz, richardson,
    checksum_interval)
from plate_inverse_problem_tpu.diagnostics.ritz import clamped_strip_frequencies
from plate_inverse_problem_tpu.mesh.delaunay import border, chain, build_mesh

ACC = pip.Accelerometer("AP1030")
MAT = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
E, G, NU, H = 200e9, 75e9, 200e9 / (2 * 75e9) - 1, 2e-3
F50 = np.linspace(40, 600, 50)
F3000 = np.linspace(40, 600, 3000)


def symm_problem(ny=None, accel=ACC):
    geom = pip.Geometry("symm", ACC,
                        pip.GeometryParams(100e-3, 20e-3, H, 10e-3, None),
                        ny=ny)
    return pip.Problem(geom, MAT, accel)


print("== Richardson (symm, with accelerometer) ==")
tabs = {}
for ny in (3, 6, 12):
    p = symm_problem(ny)
    exp = modal_frf_expansion(p, 600.0, n_modes_min=48)
    tabs[ny] = np.sqrt(exp["lam"]) / (2 * np.pi)
    cs = frf_from_expansion(exp, F50).sum()
    print(f" ny={ny:2d} n={p.n_free:6d} f0={tabs[ny][0]:9.4f} cs50={cs:8.2f}",
          flush=True)
    if ny == 6:
        exp6 = exp
f_star, p_obs, c_rel = richardson(tabs[3], tabs[6], tabs[12])
print(" f* =", np.round(f_star[:6], 3), " p_obs =", np.round(p_obs[:6], 2))

print("== checksum vs f0 shift (expansion, ny=6) ==")
for s in (-0.01, -0.005, 0.0, 0.005, 0.0068, 0.0085, 0.01):
    sc = np.ones(exp6["lam"].size)
    sc[0] = (1 + s) ** 2
    print(f" shift {s:+.4f}: cs={frf_from_expansion(exp6, F50, sc).sum():8.2f}")
lo, hi = checksum_interval(exp6, F50, [0.01], slack=1.0)
print(f" interval over f0 +-1%: [{lo:.1f}, {hi:.1f}]  (ref 341.9363)")

print("== Ritz upper bounds ==")
for nx, nyb in ((16, 6), (24, 8), (32, 10)):
    fb = clamped_strip_frequencies(100e-3, 20e-3, H, E, NU, 7920.0,
                                   n_x=nx, n_y=nyb, n_modes=2)
    fa = clamped_strip_frequencies(100e-3, 20e-3, H, E, NU, 7920.0,
                                   accel=ACC, accel_pos=(10e-3, 0.0),
                                   n_x=nx, n_y=nyb, n_modes=2)
    print(f" nx={nx:2d}: bare {fb[0]:9.4f}  accel {fa[0]:9.4f}", flush=True)

print("== reference-density Delaunay realizations (symm ny=3) ==")
Lx, Ly, r = 100e-3, 20e-3, ACC.radius
for seed in range(8):
    ny = 3
    loop = chain(
        border(lambda t: (0 * t, Ly / 2 - t * Ly), 0, 1, 3 * ny),
        border(lambda t: (Lx * t, -Ly / 2 + 0 * t), 0, 1, 15 * ny),
        border(lambda t: (Lx + 0 * t, -Ly / 2 + t * Ly), 0, 1, 3 * ny, label=1),
        border(lambda t: ((1 - t) * Lx, Ly / 2 + 0 * t), 0, 1, 15 * ny),
    )
    circ = border(lambda t: (10e-3 + r * np.cos(t), r * np.sin(t)),
                  0, 2 * np.pi, 4 * ny)
    m = build_mesh([loop, circ], smooth=1, seed=seed, jitter=0.35)
    geom = pip.Geometry("symm", ACC,
                        pip.GeometryParams(Lx, Ly, H, 10e-3, None))
    geom._mesh = m
    p = pip.Problem(geom, MAT, ACC)
    exp = modal_frf_expansion(p, 600.0, n_modes_min=24)
    f0 = float(np.sqrt(exp["lam"][0]) / (2 * np.pi))
    cs = frf_from_expansion(exp, F50).sum()
    print(f" seed {seed}: n={p.n_free:5d} f0={f0:9.4f} cs50={cs:7.2f}",
          flush=True)

print("== sh_i resolved-peak convergence ==")
for ny in (2, 4, 8):
    geom = pip.Geometry("sh_i", ACC,
                        pip.GeometryParams(99.9e-3, 20e-3, H, None, None),
                        ny=ny)
    p = pip.Problem(geom, MAT, ACC)
    exp = modal_frf_expansion(p, 600.0, n_modes_min=48)
    print(f" ny={ny} n={p.n_free:6d} cs3000="
          f"{frf_from_expansion(exp, F3000).sum():9.2f}", flush=True)
