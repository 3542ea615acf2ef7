"""band_mv formulations: einsum vs matmul, highest vs default, f32/f64.

Run on TPU; checks time AND whether the lowered HLO materializes a
(B, q, i, c) product buffer (the memory killer).
  PYTHONPATH=/root/repo:/root/.axon_site python .probes/bandform.py
"""
import re, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
import plate_inverse_problem_tpu  # noqa: F401  (sets global precision)

nb, b = 161, 512
c = 3 * b
rng = np.random.default_rng(0)
band64 = jnp.asarray(rng.standard_normal((nb, b, c)))
band32 = band64.astype(jnp.float32)
L = 8  # lanes


def mk(x):
    return jnp.asarray(rng.standard_normal(x))


xn = mk((L, 2, nb, c))          # mimics vmap(lanes) of (2, nb, 3b)
xn32 = xn.astype(jnp.float32)


def form_einsum(band, xn, prec):
    B = xn.shape[0] * xn.shape[1]
    z = xn.reshape(B, nb, c)
    return jnp.einsum("qic,Bqc->Bqi", band, z, precision=prec)


def form_matmul(band, xn, prec):
    B = xn.shape[0] * xn.shape[1]
    z = jnp.moveaxis(xn.reshape(B, nb, c), 0, -1)   # (nb, c, B)
    y = jnp.matmul(band, z, precision=prec)          # (nb, b, B)
    return jnp.moveaxis(y, -1, 0)


def timeit(name, f, *a):
    g = jax.jit(f, static_argnums=(2,))
    t0 = time.perf_counter()
    o = g(*a); jax.block_until_ready(o)
    t1 = time.perf_counter()
    for _ in range(5):
        o = g(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t1) / 5
    txt = jax.jit(f, static_argnums=(2,)).lower(*a).compile().as_text()
    bad = re.search(r"\[(?:16,)?%d,%d,%d\]" % (b, 0, 0), "") is not None
    # look for any 4D buffer holding the full product
    fat = bool(re.search(r"f(?:32|64)\[\d+,%d,%d,%d\]" % (nb, b, c), txt)) \
        or bool(re.search(r"f(?:32|64)\[%d,%d,%d,\d+\]" % (nb, b, c), txt))
    print(f"{name}: compile {t1-t0:.1f}s steady {dt*1e3:.2f} ms "
          f"materializes={fat}", flush=True)
    return o


# accuracy reference: numpy f64
Bt = 16
z_np = np.asarray(xn, np.float64).reshape(Bt, nb, c)
band_np = np.asarray(band64)
y_ref = np.einsum("qic,Bqc->Bqi", band_np, z_np)

def acc(name, y):
    y = np.asarray(y).reshape(Bt, nb, -1)
    print(f"   {name} rel err vs numpy f64: {np.abs(y - y_ref).max() / np.abs(y_ref).max():.2e}")

H = jax.lax.Precision.HIGHEST
D = jax.lax.Precision.DEFAULT
y0 = timeit("einsum f64 HIGH", form_einsum, band64, xn, H)
acc("einsum f64", y0)
y1 = timeit("matmul f64 HIGH", form_matmul, band64, xn, H)
acc("matmul f64", y1)
acc("einsum f32 HIGH", timeit("einsum f32 HIGH", form_einsum, band32, xn32, H))
acc("matmul f32 HIGH", timeit("matmul f32 HIGH", form_matmul, band32, xn32, H))
acc("einsum f32 DEF ", timeit("einsum f32 DEF ", form_einsum, band32, xn32, D))
acc("matmul f32 DEF ", timeit("matmul f32 DEF ", form_matmul, band32, xn32, D))
