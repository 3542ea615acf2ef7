"""Per-call blocked timing sanity for band_mv vs band_mv_pallas.

Chained timing gave 0.08 ms/apply for a 759 MiB band stream (9.7 TB/s —
physically impossible on v5e HBM).  This times INDIVIDUAL blocked calls
on fresh host-generated inputs, and also times a fused chain of K applies
inside ONE jit (scan) so the runtime cannot skip work between dispatches.
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

f_xla = jax.jit(lambda bd, x: band_mv(bd, x, layout))
f_pal = jax.jit(lambda bd, x: band_mv_pallas(bd, x, layout))


def scan_chain(f):
    def body(x, _):
        y = f(band_in, x)
        return y * 1e-3, jnp.sum(y[0, :8])
    def run(bd, x0):
        global band_in
        band_in = bd
        xK, sums = jax.lax.scan(lambda c, _: body(c, None), x0,
                                None, length=K)
        return xK, sums
    return jax.jit(run)


g_xla = jax.jit(lambda bd, x0: jax.lax.scan(
    lambda c, _: (band_mv(bd, c, layout) * 1e-3, ()), x0, None, length=K))
g_pal = jax.jit(lambda bd, x0: jax.lax.scan(
    lambda c, _: (band_mv_pallas(bd, c, layout) * 1e-3, ()), x0, None,
    length=K))

for name, f, g in (("xla ", f_xla, g_xla), ("pallas", f_pal, g_pal)):
    # individual blocked calls, fresh input each time
    ts = []
    for i in range(5):
        X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        jax.block_until_ready(X)
        t0 = time.perf_counter()
        y = f(band, X)
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    # K applies fused inside one jit (scan) — pure device time
    X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    y0, _ = g(band, X)  # compile
    jax.block_until_ready(y0)
    t0 = time.perf_counter()
    y1, _ = g(band, X * 1.0001)
    jax.block_until_ready(y1)
    t_scan = (time.perf_counter() - t0) / K
    print(f"{name}: per-call blocked {['%.2f' % (t*1e3) for t in ts]} ms; "
          f"scan-of-{K} {t_scan*1e3:.2f} ms/apply "
          f"({band_bytes/t_scan/1e9:.0f} GB/s)", flush=True)
