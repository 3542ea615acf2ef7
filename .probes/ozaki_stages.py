"""Isolate which ozaki stage breaks on the chip.

Stages: (a) band->limb peel (device) vs host numpy peel; (b) z peel;
(c) the 6-D limb-pair einsum exactness vs host int64; (d) full ozaki_mv
with HOST-built limbs substituted.  Small 21k-tier slice (first 8 blocks)
keeps compiles fast.
"""
import os

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from plate_inverse_problem_tpu.ops.ozaki import (  # noqa: E402
    _band_to_limbs, _peel_digits, _pow2_ceil, _z_to_limbs,
)

L = int(os.environ.get("L", "8"))
RADIX = 64.0

rng = np.random.default_rng(5)
nb, b = 8, 256
S = 2
band = np.empty((S, nb, b, 3 * b))
band[0] = (rng.standard_normal((nb, b, 3 * b))
           * np.exp(rng.uniform(0, np.log(1e8), size=(nb, b, 3 * b))))
band[1] = np.abs(rng.standard_normal((nb, b, 3 * b))) + 0.1
bandj = jnp.asarray(band)


def host_peel(u, n_limbs):
    digits = []
    r = u.copy()
    for _ in range(n_limbs):
        s = r * RADIX
        d = np.round(s)
        r = s - d
        digits.append(d.astype(np.int8))
    return np.stack(digits)


def host_pow2_ceil(m):
    e = np.floor(np.log2(np.maximum(m, 1e-300))) + 1.0
    t = np.exp2(e)
    t = np.where(t < m, t * 2.0, t)
    t = np.where(t * 0.5 >= m, t * 0.5, t)
    return np.where(m == 0.0, 1.0, t)


# ---- stage a: device peel vs host peel ---------------------------------
D_dev, tau_dev = jax.jit(_band_to_limbs, static_argnums=(1, 2, 3))(
    bandj, nb, b, L)
D_dev = np.asarray(D_dev)          # (S, 3, L, nb, b, b)
tau_dev = np.asarray(tau_dev)

m = np.max(np.abs(band), axis=-1)
tau_h = 2.0 * host_pow2_ceil(m)
print("tau match:", np.array_equal(tau_dev, tau_h), flush=True)
u = band / tau_h[..., None]
D_h = host_peel(u, L)              # (L, S, nb, b, 3b)
D_h = D_h.reshape(D_h.shape[:-1] + (3, b)).transpose(1, 4, 0, 2, 3, 5)
nd = int((D_dev != D_h).sum())
print(f"digit mismatches dev vs host: {nd} / {D_h.size}", flush=True)

# representation error of each digit set (reconstruct in exact f64)
w = RADIX ** -(np.arange(1, L + 1))
for name, D in (("host", D_h), ("dev ", D_dev)):
    # (S,3,L,nb,b,b) -> value = sum_l d*w
    rec = np.einsum("l,sdlqic->sdqic", w, D.astype(np.float64))
    # compare against u reshaped the same way
    u2 = u.reshape(S, nb, b, 3, b).transpose(0, 3, 1, 2, 4)
    err = np.abs(rec - u2).max()
    print(f"peel {name}: max |rec - u| = {err:.3e} (target < {2.0**(-7*L):.1e})",
          flush=True)

# ---- stage c: the 6-D einsum exactness ---------------------------------
B = 16
Z = rng.integers(-64, 65, size=(L, B, nb, b), dtype=np.int8)
Dj = jnp.asarray(D_dev[:, 1])      # main diagonal (S, L, nb, b, b)
Zj = jnp.asarray(Z)
O = jax.jit(lambda A, ZZ: jnp.einsum("slqic,jBqc->sljBqi", A, ZZ,
                                     preferred_element_type=jnp.int32))(Dj, Zj)
O = np.asarray(O).astype(np.int64)
refO = np.einsum("slqic,jBqc->sljBqi",
                 D_dev[:, 1].astype(np.int64), Z.astype(np.int64))
print("einsum 6D exact:", int(np.abs(O - refO).max()),
      "(max |O|", int(np.abs(refO).max()), ")", flush=True)

# ---- stage d: recombination on device ----------------------------------
wj = jnp.asarray(w)


def recombine(Oi):
    ww = wj[:, None] * wj[None, :]
    return (Oi.astype(jnp.float64)
            * ww[None, :, :, None, None, None]).sum(axis=(1, 2))


y_dev = np.asarray(jax.jit(recombine)(jnp.asarray(refO.astype(np.int32))))
ww = w[:, None] * w[None, :]
y_h = (refO.astype(np.float64) * ww[None, :, :, None, None, None]).sum((1, 2))
scale = np.abs(y_h).max()
print(f"recombine dev vs host: max abs diff {np.abs(y_dev - y_h).max():.3e} "
      f"(scale {scale:.3e})", flush=True)
print("DONE", flush=True)
