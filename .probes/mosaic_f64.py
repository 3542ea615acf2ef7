"""Does Mosaic (Pallas TPU) accept f64 in-kernel?

If yes: the f64-grade band apply kernel can compute directly in f64
(elementwise mul + adds in VMEM, no HBM-materialized product tensor).
If no: fall back to double-single f32 pairs (error-free transforms).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")


def k_f64(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] * b_ref[:] + a_ref[:]


def k_f64_reduce(a_ref, b_ref, o_ref):
    # an in-kernel f64 contraction surrogate: elementwise product + sum
    # along the last axis
    o_ref[:] = jnp.sum(a_ref[:] * b_ref[:], axis=-1)


a = jnp.asarray(np.random.default_rng(0).standard_normal((8, 256)))
b = jnp.asarray(np.random.default_rng(1).standard_normal((8, 256)))
print("dtypes:", a.dtype)

for name, kern, oshape in (
    ("elementwise", k_f64, jax.ShapeDtypeStruct((8, 256), jnp.float64)),
    ("reduce", k_f64_reduce, jax.ShapeDtypeStruct((8,), jnp.float64)),
):
    try:
        f = pl.pallas_call(kern, out_shape=oshape)
        y = f(a, b)
        ref = (np.asarray(a) * np.asarray(b) + np.asarray(a)
               if name == "elementwise"
               else np.sum(np.asarray(a) * np.asarray(b), axis=-1))
        err = float(np.max(np.abs(np.asarray(y) - ref))
                    / max(float(np.max(np.abs(ref))), 1e-30))
        print(f"{name}: OK rel_err={err:.2e}")
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
