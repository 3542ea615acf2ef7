"""Optimizers operating on a jit'd scalar loss.

Re-implementation of the reference's ``jax_plate/Optimizers.py`` (:1-367):
trust-region Newton, gradient descent, three coordinate-descent variants, the
``optResult`` record and the fixed-parameter wrapper.  The device does all
heavy lifting (value/grad/Hessian are jit-compiled); the Python outer loop
keeps full iteration histories exactly like the reference, which the report /
log writers consume.
"""
from .local import (
    FixedParameterFunction,
    optResult,
    optimize_trust_region,
    optimize_gd,
    optimize_cd,
    optimize_cd_mem,
    optimize_cd_mem2,
    solve_trust_region_model,
    get_model_newt,
)
from .second_order import (
    optimize_newton,
    optimize_lbfgs,
    optimize_gauss_newton,
    JointResidual,
)

__all__ = [
    "FixedParameterFunction",
    "optResult",
    "optimize_trust_region",
    "optimize_gd",
    "optimize_cd",
    "optimize_cd_mem",
    "optimize_cd_mem2",
    "solve_trust_region_model",
    "get_model_newt",
    "optimize_newton",
    "optimize_lbfgs",
    "optimize_gauss_newton",
    "JointResidual",
]
