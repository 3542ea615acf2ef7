"""Host-readback-forced timing: the only trustworthy clock on axon.

block_until_ready returns early on this platform (measured 0.07 ms for a
759 MiB-stream apply).  Force a scalar host readback after every apply —
execution cannot be skipped or deferred past a host transfer of the
result.  Readback overhead is measured separately and subtracted.
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402
from plate_inverse_problem_tpu.ops.band import (  # noqa: E402
    band_mv, build_band_layout, flat_to_band,
)
from plate_inverse_problem_tpu.ops.pallas_band import band_mv_pallas  # noqa: E402

REFINE = float(os.environ.get("REFINE", "9"))
B = int(os.environ.get("B", "16"))
K = int(os.environ.get("K", "8"))

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
rows = np.asarray(p.op.pattern.rows)
cols = np.asarray(p.op.pattern.cols)
n = p.n_free
layout = build_band_layout(rows, cols, n)
band_bytes = layout.nb * layout.b * 3 * layout.b * 4
print(f"n={n} nb={layout.nb} b={layout.b} band={band_bytes/2**20:.0f} MiB "
      f"(HBM floor ~{band_bytes/820e9*1e3:.2f} ms/apply)", flush=True)

rng = np.random.default_rng(5)
vals = jnp.asarray(rng.standard_normal(rows.size).astype(np.float32))
band = flat_to_band(vals, layout, jnp.asarray(layout.lin)).astype(jnp.float32)
X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

# scan of K applies inside one jit, returning only a scalar
g_xla = jax.jit(lambda bd, x0: jax.lax.scan(
    lambda c, _: (band_mv(bd, c, layout) * 1e-3, ()), x0, None,
    length=K)[0].sum())
g_pal = jax.jit(lambda bd, x0: jax.lax.scan(
    lambda c, _: (band_mv_pallas(bd, c, layout) * 1e-3, ()), x0, None,
    length=K)[0].sum())
g_nul = jax.jit(lambda bd, x0: x0.sum() + bd[0, 0, 0])

for name, g in (("null", g_nul), ("xla ", g_xla), ("pallas", g_pal)):
    s = float(g(band, X))  # compile + settle
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        s = float(g(band, X * (1.0 + 1e-4 * i)))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / K
    print(f"{name}: scan-of-{K}+readback {['%.1f' % (t*1e3) for t in ts]} ms"
          f" -> {per*1e3:.2f} ms/apply ({band_bytes/per/1e9:.0f} GB/s)"
          f" [sum={s:.3e}]", flush=True)
