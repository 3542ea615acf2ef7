"""Multi-chip scaling over a JAX device mesh.

The reference's only parallelism is OpenMP fan-out of the frequency batch on
one CPU (SURVEY §2.4; InnerState.h:251-304).  The TPU-native equivalent:
frequencies are the data-parallel axis, sharded over ICI via
``jax.sharding`` — each chip owns a slice of the sweep, the modal basis is
replicated (it is per-parameter work), and the only collectives are the loss
reduction and gradient psum, which XLA inserts from sharding annotations.

Pipeline/expert/context parallelism do not exist in this workload (no
attention, no sequence axis — SURVEY §5); the honest axes are:

* ``freq`` — data parallel over the sweep (maps to the reference's OpenMP);
* ``dof``  — tensor-parallel sharding of the dense resolvent matmuls /
  factorizations for large meshes.
"""
from .freq_shard import (
    make_mesh,
    shard_frequencies,
    sharded_fr_function,
    sharded_gn_step,
    sharded_train_step,
)

__all__ = [
    "make_mesh",
    "shard_frequencies",
    "sharded_fr_function",
    "sharded_gn_step",
    "sharded_train_step",
]
