"""Chip A/B at the scale tiers: emulated-f64 band apply vs ozaki int8.

Measures the fused 2-operator apply (K, M — the ki_proportional hot
path) with readback-forced scan timing, plus accuracy of both against a
host numpy f64 SpMV on the same permuted data.  env REFINE (default 9),
B lanes (default 16), L limbs (default 7).
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
from plate_inverse_problem_tpu.ops.ozaki import (  # noqa: E402
    build_ozaki_band, ozaki_mv,
)

REFINE = float(os.environ.get("REFINE", "9"))
B = int(os.environ.get("B", "16"))
L = int(os.environ.get("L", "8"))
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
print(f"n={n} nnz={rows.size} nb={layout.nb} b={layout.b} L={L} B={B}",
      flush=True)

rng = np.random.default_rng(5)
Kv = (rng.standard_normal(rows.size)
      * np.exp(rng.uniform(0, np.log(1e8), size=rows.size)))
Mv = np.abs(rng.standard_normal(rows.size)) + 0.1
lin = jnp.asarray(layout.lin)
bK = flat_to_band(jnp.asarray(Kv), layout, lin)
bM = flat_to_band(jnp.asarray(Mv), layout, lin)
stack = jnp.stack([bK, bM])
oz = build_ozaki_band(stack, layout, n_limbs=L)
jax.block_until_ready(oz.D)
X = jnp.asarray(rng.standard_normal((B, n)))

f_f64 = jax.jit(lambda s, x: jnp.stack([band_mv(s[0], x, layout),
                                        band_mv(s[1], x, layout)]))
f_oz = jax.jit(lambda o, x: ozaki_mv(o, x))

# ---- accuracy vs host numpy (exactly-rounded f64 SpMV) ------------------
import scipy.sparse as sp  # noqa: E402
rp = layout.iperm[rows]
cp = layout.iperm[cols]
Ap = sp.coo_matrix((Kv, (rp, cp)), shape=(n, n)).tocsr()
Mp = sp.coo_matrix((Mv, (rp, cp)), shape=(n, n)).tocsr()
x0 = np.asarray(X[0])
refK = Ap @ x0
refM = Mp @ x0
abs_scale = float(np.abs(Ap) @ np.abs(x0) + 1e-300).max() if False else \
    float(((abs(Ap)) @ np.abs(x0)).max())
y64 = np.asarray(f_f64(stack, X))
yoz = np.asarray(f_oz(oz, X))
for name, y in (("f64 ", y64), ("ozaki", yoz)):
    eK = np.max(np.abs(y[0, 0] - refK)) / abs_scale
    eM = np.max(np.abs(y[1, 0] - refM)) / float((abs(Mp) @ np.abs(x0)).max())
    print(f"{name}: err vs host (abs-sum rel) K={eK:.2e} M={eM:.2e}",
          flush=True)

# ---- readback-forced timing --------------------------------------------
def _nrm(c):
    return c / jnp.max(jnp.abs(c))


g_f64 = jax.jit(lambda s, x0_: jax.lax.scan(
    lambda c, _: (_nrm(band_mv(s[0], c, layout)
                       + band_mv(s[1], c, layout)), ()),
    x0_, None, length=K)[0].sum())
g_oz = jax.jit(lambda o, x0_: jax.lax.scan(
    lambda c, _: (_nrm(ozaki_mv(o, c).sum(0)), ()),
    x0_, None, length=K)[0].sum())
g_nul = jax.jit(lambda s, x0_: x0_.sum() + s.sum())

for name, g, arg in (("null", g_nul, jnp.asarray(np.zeros((1, 2, 1, 1, 1)))),
                     ("f64 fused", g_f64, stack), ("ozaki", g_oz, oz)):
    try:
        s = float(g(arg, X))
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        continue
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        s = float(g(arg, X * (1.0 + 1e-4 * i)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: scan-of-{K} {['%.0f' % (t*1e3) for t in ts]} ms -> "
          f"{min(ts)/K*1e3:.2f} ms/apply [s={s:.3e}]", flush=True)
