"""Test configuration: CPU backend with 8 virtual devices, float64.

Tests run on the JAX CPU backend (the 'fake backend' of this framework —
precedent: the reference pins jax to CPU at Sparse.py:16), with
``xla_force_host_platform_device_count=8`` so multi-chip sharding tests
exercise a real 8-device mesh without TPU hardware.
"""
import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ.setdefault("PIP_TPU_PRECISION", "x64")

import jax  # noqa: E402

# The environment pins jax_platforms to the 'axon' TPU plugin via a site hook;
# override it before any computation so tests never touch the TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
