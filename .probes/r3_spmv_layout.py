"""A_apply layout shootout at the bench tier + f32 CGS/P_apply costs."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None), refine=1.0)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
core, od = p.getFRCore()
n = p.n_free
rows, cols = od['rows'], od['cols']
nnz = rows.shape[0]
invK = od['invK32']
W = od['W64']; m = W.shape[1]
print(f'n={n} nnz={nnz} m={m}', flush=True)

rng = np.random.default_rng(0)
F = 512
X = jnp.asarray(rng.standard_normal((F, 2, n)))        # (512, 2, n) f64
Xf = X.reshape(F * 2, n)
Kf = jnp.asarray(np.asarray(od['MIn'], np.float64))
Mf = Kf * 1.5

def timeit(name, f, *a, reps=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms', flush=True)

# single flat spmv on flattened batch
timeit('spmv_flat f64 (1024, n)', jax.jit(lambda X: spmv_flat(Kf, rows, cols, X, n)), Xf)
# two separate spmv (K and M) on flattened batch
def two_sep(X):
    return spmv_flat(Kf, rows, cols, X, n), spmv_flat(Mf, rows, cols, X, n)
timeit('2 x spmv_flat f64 (1024, n)', jax.jit(two_sep), Xf)
# fused per-lane vmap layout (current engine style, S=2)
KM = jnp.stack([Kf, Mf])
def fused(X):
    def one(uu):
        contrib = KM[:, None, :] * uu[..., cols][None]
        out = jnp.zeros((2,) + uu.shape[:-1] + (n,), contrib.dtype)
        return out.at[..., rows].add(contrib)
    return jax.vmap(one)(X)
timeit('fused S=2 per-lane vmap', jax.jit(fused), X)

# f32 CGS via MXU dots: V (F, k, 2n) f32, w (F, 2n) f32
for k in (8, 6):
    V32 = jnp.asarray(rng.standard_normal((F, k, 2 * n)), jnp.float32)
    w32 = jnp.asarray(rng.standard_normal((F, 2 * n)), jnp.float32)
    Vc = jnp.asarray(rng.standard_normal((F, k, 2, n)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((F, 2, n)), jnp.float32)
    def cgs_f32(V, w):
        # complex dots as 4-component einsum, f32
        t = jnp.einsum('fkcn,fdn->fkcd', V, w)
        re = t[..., 0, 0] + t[..., 1, 1]
        im = t[..., 0, 1] - t[..., 1, 0]
        coef = jnp.stack([jnp.stack([re, -im], -1), jnp.stack([im, re], -1)], -2)
        w = w - jnp.einsum('fkcd,fkdn->fcn', coef, V)
        t = jnp.einsum('fkcn,fdn->fkcd', V, w)
        re = t[..., 0, 0] + t[..., 1, 1]
        im = t[..., 0, 1] - t[..., 1, 0]
        coef = jnp.stack([jnp.stack([re, -im], -1), jnp.stack([im, re], -1)], -2)
        return w - jnp.einsum('fkcd,fkdn->fcn', coef, V)
    timeit(f'CGS2 f32 k={k} (512 lanes)', jax.jit(cgs_f32), Vc, wc)

# f32 band ops
Zw32 = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
MZ32 = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
X32 = X.astype(jnp.float32)
def proj32(X):
    def one(rr):
        return rr - (MZ32 @ (Zw32.T @ rr.T)).T
    return jax.vmap(one)(X)
timeit('band M-projection f32 (512x2)', jax.jit(proj32), X32)

# f32 PR variants with separate f32 spmv
K32 = Kf.astype(jnp.float32)
def p_gemm(X):
    return jnp.einsum("ij,...j->...i", invK, X)
def p_refine(X, k):
    y = p_gemm(X)
    for _ in range(k):
        r = X - spmv_flat(K32, rows, cols, y.reshape(F * 2, n), n).reshape(F, 2, n)
        y = y + p_gemm(r)
    return y
timeit('precond PR=0 f32', jax.jit(p_gemm), X32)
timeit('precond PR=1 f32', jax.jit(lambda X: p_refine(X, 1)), X32)
timeit('precond PR=3 f32', jax.jit(lambda X: p_refine(X, 3)), X32)

# f32 reconstruction k=8
k = 8
Z32 = jnp.asarray(rng.standard_normal((F, k, 2, n)), jnp.float32)
y = jnp.asarray(rng.standard_normal((F, k, 2)), jnp.float32)
def recon32(Z, y):
    a = jnp.einsum('fk,fkn->fn', y[..., 0], Z[:, :, 0]) - jnp.einsum('fk,fkn->fn', y[..., 1], Z[:, :, 1])
    b = jnp.einsum('fk,fkn->fn', y[..., 0], Z[:, :, 1]) + jnp.einsum('fk,fkn->fn', y[..., 1], Z[:, :, 0])
    return jnp.stack([a, b], 1)
timeit('recon f32 k=8', jax.jit(recon32), Z32, y)
