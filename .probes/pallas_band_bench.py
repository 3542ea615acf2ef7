"""Pallas band_mv vs XLA batched-GEMM band_mv on the chip (f32).

The XLA schedule reached ~110 GB/s of ~820 on the 82k band tensor
(cyclecost.log); the Pallas streaming kernel targets bandwidth-limited
time.  env REFINE (default 8 ~ 82k DOF), B lanes (default 16).
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

REFINE = float(os.environ.get("REFINE", "8"))
B = int(os.environ.get("B", "16"))

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
print(f"n={n} nnz={rows.size} layout nb={layout.nb} b={layout.b} "
      f"band bytes={layout.nb*layout.b*3*layout.b*4/2**20:.0f} MiB",
      flush=True)

rng = np.random.default_rng(5)
vals = jnp.asarray(rng.standard_normal(rows.size).astype(np.float32))
band = flat_to_band(vals, layout, jnp.asarray(layout.lin)).astype(jnp.float32)
X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

f_xla = jax.jit(lambda bd, x: band_mv(bd, x, layout))
f_pal = jax.jit(lambda bd, x: band_mv_pallas(bd, x, layout))

# CHAINED timing: feed each output back as the next input (scaled to stay
# finite).  Repeated identical executions are memoized somewhere in the
# axon runtime (measured "0.03 ms" for a 759 MiB stream = 25 TB/s —
# impossible), so every call must see distinct inputs and depend on the
# previous one.
ITERS = int(os.environ.get("ITERS", "10"))

for name, f in (("xla ", f_xla), ("pallas", f_pal)):
    t0 = time.perf_counter()
    y = f(band, X); jax.block_until_ready(y)
    t_first = time.perf_counter() - t0
    x_it = X
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x_it = f(band, x_it) * 1e-3
    jax.block_until_ready(x_it)
    dt = (time.perf_counter() - t0) / ITERS
    gbps = layout.nb * layout.b * 3 * layout.b * 4 / dt / 1e9
    print(f"{name}: first={t_first:.1f}s chained={dt*1e3:.2f} ms/apply "
          f"({gbps:.0f} GB/s of band stream)", flush=True)

ya = np.asarray(f_xla(band, X))
yp = np.asarray(f_pal(band, X))
print("agreement:",
      float(np.max(np.abs(ya - yp)) / max(np.max(np.abs(ya)), 1e-30)),
      flush=True)
