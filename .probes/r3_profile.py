"""Decompose the mixed-sweep cost at the bench tier (n=1466, 512 freqs).

Times each sub-block of one sweep at real shapes: RR setup, x0 start,
A_apply, P_apply (PR=0/1/3), CGS2 traffic at k=20 vs k=6, reconstruction.
Also re-runs the full sweep to capture accuracy with the f64 split
transforms (nominal + perturbed theta vs f64 splu oracle).
"""
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES
from plate_inverse_problem_tpu.ops.scatter import spmv_flat
import plate_inverse_problem_tpu.ops.mixed as mixed
import scipy.sparse as sp, scipy.sparse.linalg as spla

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=1.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
F = 512
freqs = np.linspace(40, 600, F)

p = pip.Problem(geom, mat, acc)
core, od = p.getFRCore()
n = p.n_free
rows, cols = od['rows'], od['cols']
W = od['W64']; m = W.shape[1]
invK = od['invK32']; Kref32 = od.get('Kref32')
nnz = rows.shape[0]
print(f'n={n} nnz={nnz} m={m}', flush=True)

rng = np.random.default_rng(0)
Kf = jnp.asarray(np.asarray(od['MIn'], np.float64))  # flat f64 stand-in data
X = jnp.asarray(rng.standard_normal((F, 2, n)))       # lanes (F, 2, n) f64
X32 = X.astype(jnp.float32)

def timeit(name, f, *a, reps=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms', flush=True)

# --- per-iteration pieces ------------------------------------------------
KM3 = jnp.stack([Kf, Kf, Kf])
def a_apply_all(X):
    # fused 3-operator scatter applied to all lanes (vmap of _fused_mv)
    def one(uu):
        contrib = KM3[:, None, :] * uu[..., cols][None]
        out = jnp.zeros((3,) + uu.shape[:-1] + (n,), contrib.dtype)
        return out.at[..., rows].add(contrib)
    return jax.vmap(one)(X)
timeit('A_apply fused3 (512 lanes)', jax.jit(a_apply_all), X)

def p_gemm(X32):
    return jnp.einsum("ij,...j->...i", invK, X32)
timeit('precond GEMM f32 (512x2 lanes)', jax.jit(p_gemm), X32)

def p_refine(X32, k):
    y = p_gemm(X32)
    for _ in range(k):
        r = X32 - jax.vmap(lambda u: spmv_flat(Kref32, rows, cols, u, n))(y)
        y = y + p_gemm(r)
    return y
timeit('precond PR=3 (512x2)', jax.jit(lambda X32: p_refine(X32, 3)), X32)
timeit('precond PR=1 (512x2)', jax.jit(lambda X32: p_refine(X32, 1)), X32)

# band projection inside P_apply: rc = rr - (Pm @ (Zm.T @ rr.T)).T per lane
Zw = jnp.asarray(rng.standard_normal((n, m)))
MZ = jnp.asarray(rng.standard_normal((n, m)))
def band_proj(X):
    def one(rr):
        return rr - (MZ @ (Zw.T @ rr.T)).T
    return jax.vmap(one)(X)
timeit('band M-projection f64 (512x2)', jax.jit(band_proj), X)

def band_resolvent(X):
    lam = jnp.asarray(rng.standard_normal((m,))**2 + 1.0)
    def one(rr):
        q = Zw.T @ rr.T          # (m, 2)
        y = q / lam[:, None]
        return (Zw @ y).T
    return jax.vmap(one)(X)
timeit('band resolvent x0 (512x2)', jax.jit(band_resolvent), X)

# CGS2 traffic at k=20 vs k=6 (one iteration: 2 cdots + 2 csaxpy)
for k in (20, 8, 6, 4):
    V = jnp.asarray(rng.standard_normal((F, k + 1, 2, n)))
    def cgs_iter(V, X):
        def one(Vl, w):
            t = jnp.einsum("kcn,dn->kcd", Vl, w)
            re = t[:, 0, 0] + t[:, 1, 1]
            im = t[:, 0, 1] - t[:, 1, 0]
            coef = jnp.stack([jnp.stack([re, -im], 1),
                              jnp.stack([im, re], 1)], 1)
            w = w - jnp.einsum("kcd,kdn->cn", coef, Vl)
            t = jnp.einsum("kcn,dn->kcd", Vl, w)
            re2 = t[:, 0, 0] + t[:, 1, 1]
            im2 = t[:, 0, 1] - t[:, 1, 0]
            coef = jnp.stack([jnp.stack([re2, -im2], 1),
                              jnp.stack([im2, re2], 1)], 1)
            return w - jnp.einsum("kcd,kdn->cn", coef, Vl)
        return jax.vmap(one)(V[:, :k], X)
    timeit(f'CGS2 iter k={k} (512 lanes)', jax.jit(cgs_iter), V, X)

# RR setup (per sweep, not per lane)
W64 = jnp.asarray(W)
def rr_setup(Kflat):
    KW = jax.vmap(lambda w: spmv_flat(Kflat, rows, cols, w, n))(W64.T)
    Kw = KW @ W64
    Kw = 0.5 * (Kw + Kw.T)
    lam_w, Qw = jnp.linalg.eigh(Kw)
    Zw64 = W64 @ Qw
    return lam_w, Zw64
timeit('RR setup (SpMV m + matmul + eigh)', jax.jit(rr_setup), Kf)

# reconstruction: x = x0 + Z y at k=20
for k in (20, 6):
    Z = jnp.asarray(rng.standard_normal((F, k, 2, n)))
    y = jnp.asarray(rng.standard_normal((F, k, 2)))
    def recon(Z, y):
        def one(Zl, yl):
            a = jnp.einsum("k,kn->n", yl[:, 0], Zl[:, 0]) - jnp.einsum("k,kn->n", yl[:, 1], Zl[:, 1])
            b = jnp.einsum("k,kn->n", yl[:, 0], Zl[:, 1]) + jnp.einsum("k,kn->n", yl[:, 1], Zl[:, 0])
            return jnp.stack([a, b])
        return jax.vmap(one)(Z, y)
    timeit(f'reconstruction k={k}', jax.jit(recon), Z, y)

# zeros allocation V+Z at k=20
def alloc(k):
    return jnp.zeros((F, k + 1, 2, n)), jnp.zeros((F, k, 2, n))
timeit('V+Z zero alloc k=20', jax.jit(lambda: alloc(20)))

# --- full sweep + accuracy with f64 transforms ---------------------------
th0 = np.asarray(p.parameters, np.float64)
th_pert = th0 * np.asarray([1.1, 0.95, 1.2])

def oracle_for(th):
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(th, 0.0))
    op = p.op
    K_flat = sum(Av[i]*op.mats['A'+s] + Bv[i]*op.mats['B'+s] + Dv[i]*op.mats['D'+s] for i, s in enumerate(MODULI_INDICES))
    bK = sum(Av[i]*op.lifts['A'+s] + Bv[i]*op.lifts['B'+s] + Dv[i]*op.lifts['D'+s] for i, s in enumerate(MODULI_INDICES))
    M_flat = np.asarray(p.MInertia); fIn = np.asarray(p.fInertia)
    Kc = sp.csc_matrix((K_flat, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    Mc = sp.csc_matrix((M_flat.astype(complex), (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    def row(nm):
        R, r0 = op.readout[nm]; return R.mean(axis=0), r0.mean()
    cu, ou = row('u'); cv, ov = row('v'); cw, ow = row('w'); cwx, owx = row('wx'); cwy, owy = row('wy')
    eff = acc.effective_height*acc.height; ts = acc.transverse_sensitivity
    out = np.zeros(F)
    for i in range(F):
        om = 2*np.pi*freqs[i]
        u_full = spla.splu((Kc - om**2*Mc).tocsc()).solve(bK - om**2*fIn)
        uu = (cu-eff*cwx)@u_full + (ou-eff*owx); vv = (cv-eff*cwy)@u_full + (ov-eff*owy); ww = cw@u_full + ow
        out[i] = np.sqrt((abs(uu)*ts)**2 + (abs(vv)*ts)**2 + abs(ww)**2)
    return out

print('building oracles...', flush=True)
orc0 = oracle_for(th0)
orcp = oracle_for(th_pert)

fn = p.getFRFunction()
fj = jnp.asarray(freqs)
t0 = time.perf_counter()
fr = fn(fj, jnp.asarray(th0, np.float32)); jax.block_until_ready(fr)
print(f'compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
t0 = time.perf_counter()
for _ in range(3):
    fr = fn(fj, jnp.asarray(th0, np.float32))
jax.block_until_ready(fr)
dt = (time.perf_counter()-t0)/3
rel0 = np.max(np.abs(np.asarray(fr) - orc0)/np.abs(orc0))
frp = np.asarray(fn(fj, jnp.asarray(th_pert, np.float32)))
relp = np.max(np.abs(frp - orcp)/np.abs(orcp))
print(f'full sweep (nref={p.n_refine}, PR={mixed._PRECOND_REFINE}): {dt*1e3:.1f} ms -> {F/dt:.0f} solves/s, rel0={rel0:.2e} relp={relp:.2e}', flush=True)
