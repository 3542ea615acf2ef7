"""Joint multi-cut orthotropic identification via ``JointResidual``.

The orthotropic 5-parameter inverse on a single strip is ill-posed: bending
of a narrow strip is dominated by the along-axis modulus, so the remaining
constants live in a near-flat valley (see ROADMAP.md).  The published
workflow cuts several strips from the same sheet at different angles and
fits them jointly.  Here the cuts are SOL materials (single-orientation
laminate, reference Material.py:639-788) at 0/90/45 degrees sharing ONE
parameter vector theta = [E1, E2, G12, nu12, beta] — the 45-degree cut is
what couples G12 and nu12 into bending through the Q-bar 16/26 terms.

Runs on CPU in about a minute; the same ResidualFunction objects run
sharded on a TPU mesh via parallel/ for production-size sweeps.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.optimize.second_order import (
    JointResidual, optimize_gauss_newton,
)

# ground truth: carbon-like orthotropic sheet  [E1, E2, G12, nu12, beta]
TRUE = np.array([120e9, 8.5e9, 4.5e9, 0.30, 0.006])
ANGLES = [0.0, 90.0, 45.0]


def make_problem(angle):
    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "symm", acc,
        pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=1,
    )
    mat = pip.get_material(
        1550.0, "sol", angles=(angle,),
        E1=TRUE[0], E2=TRUE[1], G12=TRUE[2], nu12=TRUE[3], beta=TRUE[4],
    )
    return pip.Problem(geom, mat, acc, engine="direct")


freqs = np.linspace(40.0, 500.0, 64)
problems = [make_problem(a) for a in ANGLES]
synthetic = [np.asarray(p.getFRFunction()(freqs, TRUE)) for p in problems]


class Scaled:
    """Residual in relative coordinates s (theta = s * TRUE): Gauss-Newton
    normal equations are hopeless on raw moduli spanning 1e11..1e-3."""

    def __init__(self, res):
        self._res = res

    def __call__(self, s):
        return self._res(jnp.asarray(s) * TRUE)

    def value_and_jac(self, s):
        v, J = self._res.value_and_jac(jnp.asarray(s) * TRUE)
        return v, J * jnp.asarray(TRUE)[None, :]


joint = JointResidual([
    Scaled(p.getResidualFunction(freqs, fr.astype(complex), "log_afc"))
    for p, fr in zip(problems, synthetic)
])

s0 = np.array([1.35, 0.70, 1.40, 0.85, 1.50])
out = optimize_gauss_newton(joint, s0, N_steps=30)
xf = np.asarray(out.x) * TRUE

print("residual MSE  :", out.f_history[-1])
print("start rel err :", np.abs(s0 - 1.0))
print("final rel err :", np.abs(xf - TRUE) / TRUE)
print("recovered     :", xf)
print("truth         :", TRUE)
