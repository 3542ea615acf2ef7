"""Per-op costs at the 82k tier vs batch: band0 f32 mv, two-grid cycle,
f64 scatter SpMV, Kc GEMM.  TPU:
  PYTHONPATH=/root/repo:/root/.axon_site REFINE=8 python .probes/cyclecost.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.band import band_mv
from plate_inverse_problem_tpu.ops.mg import twogrid_apply
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

refine = float(os.environ.get("REFINE", "8"))
acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
geom = pip.Geometry("sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
t0 = time.time()
p = pip.Problem(geom, mat, acc, engine="mixed", precond="mg", f_max=600.0)
core, od = p.getFRCore()
print(f"prep {time.time()-t0:.0f}s n={p.n_free}", flush=True)
layout = p._band_layout
rl = p._mg_rl
n = p.n_free
rng = np.random.default_rng(0)


def timeit(name, f, *a):
    g = jax.jit(f)
    o = g(*a); jax.block_until_ready(o)
    t1 = time.perf_counter()
    for _ in range(5):
        o = g(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t1)/5*1e3:7.2f} ms", flush=True)


for B in (16, 32, 64, 128):
    X32 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    timeit(f"band0 f32 mv      B={B:3d}",
           lambda bd, x: band_mv(bd, x, layout), od["mg_band0"], X32)
for B in (16, 64):
    X32 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    timeit(f"two-grid cycle    B={B:3d}",
           lambda bd, dv, pt, kc, sl, x: twogrid_apply(
               bd, dv, p._mg_lmax, pt, kc, x, layout, rl, sl),
           od["mg_band0"], od["mg_dinv"], od["mg_Pt"], od["mg_Kcinv"],
           od["mg_slots"], X32)
Kf = jnp.asarray(rng.standard_normal(od["rows"].shape[0]))
for B in (16, 64):
    X64 = jnp.asarray(rng.standard_normal((B, n)))
    timeit(f"scatter f64 SpMV  B={B:3d}",
           lambda d, r, c, x: spmv_flat(d, r, c, x, n),
           Kf, od["rows"], od["cols"], X64)
for B in (16, 64):
    Xc = jnp.asarray(rng.standard_normal((B, rl.n_coarse)), jnp.float32)
    timeit(f"Kc_inv GEMM       B={B:3d}",
           lambda kc, x: jnp.einsum("ij,...j->...i", kc, x),
           od["mg_Kcinv"], Xc)

# fused / scanned scatter variants
from plate_inverse_problem_tpu.ops import mixed as MM
KM = jnp.stack([Kf, Kf])
import jax.numpy as jnp2
def fused(stacked, uu, seg, rows, cols):
    S, nnz = stacked.shape
    if seg >= nnz:
        contrib = stacked[:, None, None, :] * uu[None, ..., cols]
        out = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked.dtype)
        return out.at[..., rows].add(contrib)
    k = -(-nnz // seg); pad = k*seg - nnz
    dp = jnp.pad(stacked, ((0,0),(0,pad))).reshape(S, k, seg).transpose(1,0,2)
    rp = jnp.pad(rows, (0,pad)).reshape(k, seg)
    cp = jnp.pad(cols, (0,pad)).reshape(k, seg)
    def step(out, args):
        d, r, c = args
        contrib = d[:, None, None, :] * uu[None, ..., c]
        return out.at[..., r].add(contrib), None
    out0 = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked.dtype)
    out, _ = jax.lax.scan(step, out0, (dp, rp, cp))
    return out

for B in (16, 64):
    U = jnp.asarray(rng.standard_normal((B, 2, n)))
    for segv in (1 << 17, 1 << 19, 1 << 22):
        timeit(f"fused S=2 B={B}x2 seg={segv>>10}k",
               lambda d, r, c, u: fused(d, u, segv, r, c),
               KM, od["rows"], od["cols"], U)
