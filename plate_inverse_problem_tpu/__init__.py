"""plate_inverse_problem_tpu — a TPU-native differentiable plate-FEM
inverse-problem framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``Sageblatt/plate_inverse_problem`` (frequency-domain Kirchhoff-Love /
laminate plate FEM; coefficient inverse problem recovering elastic moduli and
loss factors from measured frequency-response data).  The CUDA/C++/FreeFEM
stack of the reference maps to:

* FreeFEM++ mesh+assembly  -> ``mesh`` (static host-side meshes) +
  ``fem`` (Morley/P1 element kernels, vmap+scatter assembly, BC lifting)
* UMFPACK sparse LU (jax_plate_lib) -> ``ops`` (modal resolvent sweep /
  batched dense LU with implicit-diff custom AD)
* jax_plate.Problem / Material / Optimizers / Input -> ``models``,
  ``optimize``, ``io``
* OpenMP frequency batch -> ``parallel`` (shard_map over a freq device mesh)
"""
from . import config
from .models.materials import (
    ATYPES,
    Material,
    Isotropic,
    Orthotropic,
    OrthotropicD4,
    SOL,
    SymmetricalSOL,
    get_material,
)
from .models.accelerometer import Accelerometer, AccelerometerParams
from .models.geometry import Geometry, GeometryParams
from .models.problem import Problem
from .mesh import TriangleMesh, generate_plate_mesh, load_msh, save_msh
from .optimize import (
    optResult,
    optimize_trust_region,
    optimize_gd,
    optimize_cd,
    optimize_cd_mem,
    optimize_cd_mem2,
    FixedParameterFunction,
)
from .io.compress import Compressor

__version__ = "0.1.0"

__all__ = [
    "ATYPES",
    "Material",
    "Isotropic",
    "Orthotropic",
    "OrthotropicD4",
    "SOL",
    "SymmetricalSOL",
    "get_material",
    "Accelerometer",
    "AccelerometerParams",
    "Geometry",
    "GeometryParams",
    "Problem",
    "TriangleMesh",
    "generate_plate_mesh",
    "load_msh",
    "save_msh",
    "optResult",
    "optimize_trust_region",
    "optimize_gd",
    "optimize_cd",
    "optimize_cd_mem",
    "optimize_cd_mem2",
    "FixedParameterFunction",
    "Compressor",
    "config",
]
