"""Is the XLA:TPU int8 einsum an EXACT int32-accumulated MXU dot?

Gate for the Ozaki-limb f64-grade band apply: int8 products accumulated
in int32 are exact; a silent upcast to f32 accumulation would round at
2^-24 and poison the scheme.  Exactness test sums are designed to leave
the f32-representable grid (> 2^24 with odd low bits).
Also times the per-diagonal batched band GEMM shape at the 104k tier.
"""
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(7)

# ---- exactness: k=640 dot with sums far off the f32 grid ---------------
k = 640
a = rng.integers(-127, 128, size=(256, k), dtype=np.int8)
b = rng.integers(-127, 128, size=(k, 256), dtype=np.int8)
# force a few rows to all-127 so sums reach 640*127*127 ~ 1.03e7 < 2^31
a[0, :] = 127
b[:, 0] = 127
ref = a.astype(np.int64) @ b.astype(np.int64)

for pet in (jnp.int32,):
    y = jax.jit(lambda x, w: jax.lax.dot(x, w, preferred_element_type=pet))(
        jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(y).astype(np.int64)
    print(f"dot int8->{pet.__name__}: dtype={y.dtype} "
          f"max|err|={np.abs(got - ref).max()} "
          f"(max sum {np.abs(ref).max()})", flush=True)

# einsum form used by the band apply: per-diagonal batched GEMM
nb, bb, B = 162, 640, 112  # B = 7 limbs x 16 lanes
A8 = jnp.asarray(rng.integers(-127, 128, size=(nb, bb, bb), dtype=np.int8))
Z8 = jnp.asarray(rng.integers(-127, 128, size=(B, nb, bb), dtype=np.int8))
f = jax.jit(lambda A, Z: jnp.einsum("qic,Bqc->Bqi", A, Z,
                                    preferred_element_type=jnp.int32))
y = f(A8, Z8)
qs, Bs = 3, 5
refq = np.einsum("ic,Bc->Bi",
                 np.asarray(A8[qs], dtype=np.int64),
                 np.asarray(Z8[:Bs, qs], dtype=np.int64))
print("einsum int8->int32 exact:",
      int(np.abs(np.asarray(y[:Bs, qs]).astype(np.int64) - refq).max()),
      "dtype:", y.dtype, flush=True)

# ---- timing (readback-forced scan; axon block_until_ready lies) --------
K = 8
g = jax.jit(lambda A, Z: jax.lax.scan(
    lambda c, _: ((jnp.einsum("qic,Bqc->Bqi", A, c,
                              preferred_element_type=jnp.int32)
                   % 127).astype(jnp.int8), ()),
    Z, None, length=K)[0].astype(jnp.int32).sum())
g_null = jax.jit(lambda A, Z: Z.astype(jnp.int32).sum() + A[0, 0, 0])

for name, fn in (("null", g_null), ("int8 gemm", g)):
    s = int(fn(A8, Z8))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        s = int(fn(A8, Z8))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / K
    traffic = A8.size + Z8.size + 4 * B * nb * bb  # bytes per apply
    print(f"{name}: scan-of-{K} {min(ts)*1e3:.1f} ms -> {per*1e3:.2f} "
          f"ms/apply ({traffic/per/1e9:.0f} GB/s) [s={s}]", flush=True)
