"""Compute ops: the TPU-native replacement for the reference's native solver.

The reference dispatches every frequency-domain solve to a C++ pybind11 module
wrapping UMFPACK sparse LU, OpenMP-parallel over the frequency batch
(/root/reference/source/jax_plate_lib/include/InnerState.h:164-308), glued to
JAX through custom primitives with hand-written implicit-diff AD rules
(/root/reference/source/jax_plate/Sparse.py:120-282).

Here the same contract — batched complex solves of
``A(omega) = K(theta) - omega^2 M`` with adjoint-method gradients — is met
on-device:

* ``modal``  — one generalized symmetric eigendecomposition (K, M) per
  parameter set turns the whole frequency sweep into two matrix products
  (exact when the complex stiffness is ``(1+i*beta) * K_real``, which holds
  for every reference material except OrthotropicD4).  Gradients use the
  implicit-function theorem through a ``jax.custom_jvp`` — the eigenbasis is
  never differentiated.
* ``direct`` — chunked batched dense LU (``jnp.linalg.solve``) over
  frequencies, remat-wrapped; exact for arbitrary complex stiffness.

The symbolic/numeric split of UMFPACK maps to: sparsity pattern + eigenbasis
prep (trace-time / per-theta) vs. resolvent application (per-frequency,
pure MXU matmuls).
"""
from .scatter import to_dense, spmv_flat
from .spectral import generalized_eigh
from .sweep import modal_sweep, direct_sweep, sweep_solve
from .jacobi_eigh import jacobi_eigh, generalized_jacobi_eigh
from .mixed import mixed_sweep, band_basis_host, static_preconditioner_host
from .lobpcg import band_basis_lobpcg, lobpcg_pencil
from .sparse_api import (SymbolicPattern, create_symbolic, find_permutation,
                         matvec, spsolve, FAMILIES)

__all__ = [
    "SymbolicPattern",
    "create_symbolic",
    "find_permutation",
    "matvec",
    "spsolve",
    "FAMILIES",
    "to_dense",
    "spmv_flat",
    "generalized_eigh",
    "modal_sweep",
    "direct_sweep",
    "sweep_solve",
    "jacobi_eigh",
    "generalized_jacobi_eigh",
    "mixed_sweep",
    "band_basis_host",
    "band_basis_lobpcg",
    "lobpcg_pencil",
    "static_preconditioner_host",
]
