"""FEM layer: Morley C1 plate element + P1 membrane, jit-compiled assembly.

Replaces the FreeFEM++ variational-form pipeline of the reference
(/root/reference/source/jax_plate/pyFFInterface.py:10-509).  The behavioral
contract honored here: produce, per geometry,

* six bending stiffness matrices K_11..K_66 (one per anisotropic modulus),
* mass M and rotational-inertia L matrices (+ accelerometer-indicator
  corrections),
* membrane (A), coupling (B), bending (D) blocks for the 3-field laminate
  path,
* Dirichlet BC lifting (free/constrained split + RHS lift,
  pyFFInterface.py:82-118) and interpolation operators for the test-point /
  accelerometer-disk readout.

Everything is static-shape data: element kernels are vmapped closed-form
integrals (Morley's quadratic basis has *constant* second derivatives, so
stiffness integrals are exact single-point evaluations), global assembly is a
segment-sum scatter over a precomputed union sparsity pattern.
"""
from .quadrature import TRI_DEGREE2, TRI_DEGREE5
from .morley import build_morley
from .p1 import build_p1
from .assembly import (
    SparsePattern,
    assemble_symm,
    assemble_unsymm,
    SymmOperator,
    UnsymmOperator,
)

__all__ = [
    "TRI_DEGREE2",
    "TRI_DEGREE5",
    "build_morley",
    "build_p1",
    "SparsePattern",
    "assemble_symm",
    "assemble_unsymm",
    "SymmOperator",
    "UnsymmOperator",
]
