"""SpMV strategies on the real 82k-DOF operator, f64, batched.

scatter (current) vs ELL gather vs RCM block-tridiagonal band (MXU matmuls).
TPU: PYTHONPATH=/root/repo:/root/.axon_site REFINE=8 python .probes/band_probe.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat

refine = float(os.environ.get("REFINE", "8"))
B = int(os.environ.get("B", "16"))

acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
t0 = time.time()
geom = pip.Geometry("sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=refine)
p = pip.Problem(geom, mat, acc, engine="mixed", precond="mg", f_max=600.0)
n = p.n_free
rows = np.asarray(p.op.pattern.rows)
cols = np.asarray(p.op.pattern.cols)
nnz = rows.size
print(f"init {time.time()-t0:.1f}s n={n} nnz={nnz}", flush=True)

import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

rng = np.random.default_rng(0)
data = rng.standard_normal(nnz)
A = sp.csr_matrix((data, (rows, cols)), shape=(n, n))
A = A + A.T  # symmetrize pattern

t0 = time.time()
perm = reverse_cuthill_mckee(A, symmetric_mode=True)
iperm = np.empty(n, np.int64); iperm[perm] = np.arange(n)
rp, cp = iperm[rows], iperm[cols]
bw = int(np.abs(rp - cp).max())
print(f"RCM {time.time()-t0:.1f}s bandwidth={bw} (natural={int(np.abs(rows.astype(np.int64)-cols).max())})", flush=True)

# choose block size b >= bw, multiple of 256 (f64 tiles are wide)
b = max(256, -(-bw // 128) * 128)
nb = -(-n // b)
print(f"block b={b} nb={nb} band mem f64 = {3*nb*b*b*8/1e9:.2f} GB "
      f"(vs nnz {nnz*8/1e6:.0f} MB)", flush=True)

# static map: flat entry s -> (block row q, diag slot d in 0..2, iloc, jloc)
q = rp // b
d = cp // b - q + 1  # 0,1,2
assert d.min() >= 0 and d.max() <= 2, (d.min(), d.max())
iloc = rp % b
jloc = cp % b
lin = ((q * 3 + d) * b + iloc) * b + jloc  # into (nb,3,b,b) flat

lin_j = jnp.asarray(lin, dtype=jnp.int32 if lin.max() < 2**31 else jnp.int64)
print("lin max", lin.max(), "int32 ok:", lin.max() < 2**31, flush=True)

F = B
X = jnp.asarray(rng.standard_normal((F, n)))
data_j = jnp.asarray(data)
rows_j = jnp.asarray(rp.astype(np.int32))
cols_j = jnp.asarray(cp.astype(np.int32))


def to_band(vals):
    return jnp.zeros((nb * 3 * b * b,), vals.dtype).at[lin_j].add(vals).reshape(nb, 3, b, b)


def band_mv(band, X):
    # X: (F, n) -> pad to (F, nb*b), blocks (F, nb, b)
    Xp = jnp.pad(X, ((0, 0), (0, nb * b - n)))
    Xb = Xp.reshape(F, nb, b)
    # neighbor blocks: (F, nb, 3, b): [q-1, q, q+1]
    Xm = jnp.pad(Xb, ((0, 0), (1, 1), (0, 0)))
    Xn = jnp.stack([Xm[:, :-2], Xm[:, 1:-1], Xm[:, 2:]], axis=2)
    # y[f,q,i] = sum_{d,j} band[q,d,i,j] * Xn[f,q,d,j]
    Y = jnp.einsum("qdij,fqdj->fqi", band, Xn)
    return Y.reshape(F, nb * b)[:, :n]


def spmv_scatter(dv, X):
    return spmv_flat(dv, rows_j, cols_j, X, n)


# ELL
counts = np.bincount(rp, minlength=n)
L = int(counts.max())
order = np.argsort(rp, kind="stable")
fill = np.zeros(n, np.int64)
cols_ell = np.zeros((n, L), np.int32)
data_ell = np.zeros((n, L))
for s in order:
    r = rp[s]
    cols_ell[r, fill[r]] = cp[s]
    data_ell[r, fill[r]] = data[s]
    fill[r] += 1
print(f"ELL L={L} mem f64 = {n*L*8/1e6:.0f} MB", flush=True)
de = jnp.asarray(data_ell)
ce = jnp.asarray(cols_ell)


def spmv_ell(X):
    Xg = X[:, ce.reshape(-1)].reshape(F, n, L)
    return jnp.einsum("fil,il->fi", Xg, de)


def timeit(name, f, *a):
    t0 = time.perf_counter(); o = f(*a); jax.block_until_ready(o)
    t1 = time.perf_counter()
    for _ in range(5):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t1) / 5
    print(f"{name}: compile {t1-t0:.1f}s steady {dt*1e3:.2f} ms", flush=True)
    return o


band = jax.jit(to_band)(data_j)
jax.block_until_ready(band)
t0 = time.perf_counter()
band = jax.jit(to_band)(data_j); jax.block_until_ready(band)
print(f"to_band scatter: {time.perf_counter()-t0:.3f}s", flush=True)

y1 = timeit(f"scatter B={F}", jax.jit(spmv_scatter), data_j, X)
y3 = timeit(f"band    B={F}", jax.jit(band_mv), band, X)
y2 = timeit(f"ell     B={F}", jax.jit(spmv_ell), X)
print("band vs scatter:", float(jnp.abs(y1 - y3).max() / jnp.abs(y1).max()), flush=True)
print("ell  vs scatter:", float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max()), flush=True)

# f32 variants (MG cycle dtype)
X32 = X.astype(jnp.float32); band32 = band.astype(jnp.float32)
d32 = data_j.astype(jnp.float32)
y1 = timeit(f"scatter32 B={F}", jax.jit(spmv_scatter), d32, X32)
y3 = timeit(f"band32    B={F}", jax.jit(band_mv), band32, X32)
