"""Utility helpers: paths, plotting, timers.

TPU-native counterpart of the reference's ``jax_plate/Utils.py``
(/root/reference/source/jax_plate/Utils.py:1-71).
"""
from .paths import get_package_dir, get_repo_dir, get_output_dir
from .plotting import plot_fr, plot_fr_radial, plot_fr_complex, png_matrix
from .timers import Timer, block_and_time

__all__ = [
    "get_package_dir",
    "get_repo_dir",
    "get_output_dir",
    "plot_fr",
    "plot_fr_radial",
    "plot_fr_complex",
    "png_matrix",
    "Timer",
    "block_and_time",
]
