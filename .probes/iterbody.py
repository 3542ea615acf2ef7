"""Time the FGMRES iteration pieces at in-loop shapes (82k, chunk 32).
  PYTHONPATH=/root/repo:/root/.axon_site REFINE=8 python .probes/iterbody.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.mg import twogrid_apply
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

refine = float(os.environ.get("REFINE", "8"))
L = int(os.environ.get("LANES", "32"))
acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
geom = pip.Geometry("sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
p = pip.Problem(geom, mat, acc, engine="mixed", precond="mg", f_max=600.0)
core, od = p.getFRCore()
n = p.n_free
layout, rl = p._band_layout, p._mg_rl
rng = np.random.default_rng(0)
m = od["W64"].shape[1]
k_max = 20


def timeit(name, f, *a):
    g = jax.jit(f)
    o = g(*a); jax.block_until_ready(o)
    t1 = time.perf_counter()
    for _ in range(5):
        o = g(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t1)/5*1e3:7.2f} ms", flush=True)


# shapes as inside vmap(one) over L lanes: per-lane (2, n) f64
U = jnp.asarray(rng.standard_normal((L, 2, n)))
Kf = jnp.asarray(rng.standard_normal(od["rows"].shape[0]))
KM = jnp.stack([Kf, jnp.asarray(od["MIn"])])
W = od["W64"]
Zw = jnp.asarray(rng.standard_normal((n, m)))
MZ = jnp.asarray(rng.standard_normal((n, m)))
V = jnp.asarray(rng.standard_normal((L, k_max + 1, 2, n)))


def fused(stacked, uu):
    S, nnz = stacked.shape
    seg = 1 << 17
    k = -(-nnz // seg); pad = k * seg - nnz
    dp = jnp.pad(stacked, ((0, 0), (0, pad))).reshape(S, k, seg).transpose(1, 0, 2)
    rp = jnp.pad(od["rows"], (0, pad)).reshape(k, seg)
    cp = jnp.pad(od["cols"], (0, pad)).reshape(k, seg)

    def step(out, args):
        d, r, c = args
        return out.at[..., r].add(d[:, None, None, :] * uu[None, ..., c]), None

    out0 = jnp.zeros((S,) + uu.shape[:-1] + (n,), stacked.dtype)
    return jax.lax.scan(step, out0, (dp, rp, cp))[0]


timeit("A fused scan lanes", fused, KM, U)


def band_proj(uu, Zw, MZ):
    # the P_apply skinny f64 dots: band solve (2) + deflation (2) + reproj (2)
    q = Zw.T @ uu.transpose(0, 2, 1)       # (L, m, 2)? shapes per-lane...
    rc = uu - (MZ @ (Zw.T @ uu.transpose(0, 2, 1))).transpose(0, 2, 1)
    dc = rc - (rc @ MZ) @ Zw.T
    db = (Zw @ (Zw.T @ uu.transpose(0, 2, 1))).transpose(0, 2, 1)
    return db + dc


timeit("P skinny f64 dots ", band_proj, U, Zw, MZ)


def cgs2(V, w):
    re = jnp.einsum("Lkn,Ln->Lk", V[:, :, 0], w[:, 0]) \
        + jnp.einsum("Lkn,Ln->Lk", V[:, :, 1], w[:, 1])
    im = jnp.einsum("Lkn,Ln->Lk", V[:, :, 0], w[:, 1]) \
        - jnp.einsum("Lkn,Ln->Lk", V[:, :, 1], w[:, 0])
    w0 = w[:, 0] - jnp.einsum("Lk,Lkn->Ln", re, V[:, :, 0]) \
        + jnp.einsum("Lk,Lkn->Ln", im, V[:, :, 1])
    w1 = w[:, 1] - jnp.einsum("Lk,Lkn->Ln", re, V[:, :, 1]) \
        - jnp.einsum("Lk,Lkn->Ln", im, V[:, :, 0])
    return jnp.stack([w0, w1], axis=1)


W2 = U
timeit("CGS round (x2/iter)", cgs2, V, W2)

X32 = U.astype(jnp.float32)
timeit("two-grid cycle L   ",
       lambda bd, dv, pt, kc, sl, x: twogrid_apply(
           bd, dv, p._mg_lmax, pt, kc, x, layout, rl, sl),
       od["mg_band0"], od["mg_dinv"], od["mg_Pt"], od["mg_Kcinv"],
       od["mg_slots"], X32.reshape(L * 2, n))
