"""Mesh subsystem: host-side generation of *static* triangle meshes.

Replaces the reference's FreeFEM++ ``buildmesh`` layer
(/root/reference/source/jax_plate/geometry/symm.edp:24-33,
 sh_i.edp:22-31) with a pure-Python mesher.  A mesh here is data — static
numpy arrays of nodes / triangles / boundary labels — that the FEM layer
turns into jit-compiled on-device assembly.  No subprocesses, no external
binaries.
"""
from .core import TriangleMesh
from .generators import generate_plate_mesh, rectangle_with_circle
from .io import load_msh, save_msh, save_vtu
from .locate import locate_points

__all__ = [
    "TriangleMesh",
    "generate_plate_mesh",
    "rectangle_with_circle",
    "load_msh",
    "save_msh",
    "save_vtu",
    "locate_points",
]
