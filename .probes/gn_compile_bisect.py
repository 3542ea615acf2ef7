"""Bisect the GN (r+J) compile stall vs n for the mixed engine.

Synthetic operator data (no Problem/host prep): random flat pattern with
nnz ~ 23*n, random band basis W64 (m=128), random f32 preconditioner.
Variants via env:
  N=<dof>           problem size (default 12000)
  LOOP=while|scan   refinement loop structure (default while = current code)
  NREF=<k>          refinement iterations (default 6)
  F=<freqs>         sweep points (default 200)
  CHUNK=<c>         if set, lax.map the sweep in chunks of c frequencies
  JAC=1|0           compile r+J (default) or just r
"""
import os, time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import plate_inverse_problem_tpu  # noqa: F401  (enables x64 etc. via config)
from plate_inverse_problem_tpu.ops import mixed as M

n = int(os.environ.get("N", "12000"))
F = int(os.environ.get("F", "200"))
loop = os.environ.get("LOOP", "while")
n_ref = int(os.environ.get("NREF", "6"))
chunk = os.environ.get("CHUNK")
do_jac = os.environ.get("JAC", "1") == "1"
m = 128

rng = np.random.default_rng(0)
nnz = 23 * n
rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
cols = rng.integers(0, n, nnz).astype(np.int32)
Ks = rng.standard_normal(nnz)
Ms = rng.standard_normal(nnz)
W64 = np.linalg.qr(rng.standard_normal((n, m)))[0]
invK32 = rng.standard_normal((n, n)).astype(np.float32) / n
omegas = np.linspace(0.5, 1.5, F)
fIn = rng.standard_normal(n)
c = rng.standard_normal(n) / n

if loop == "scan":
    # monkeypatch: fixed-length scan refinement instead of adaptive while
    _orig_while = jax.lax.while_loop

    def fixed_while(cond, body, init):
        def sbody(state, _):
            return body(state), None
        out, _ = jax.lax.scan(sbody, init, None, length=n_ref)
        return out

    M.jax.lax = type(jax.lax)("lax_patched") if False else jax.lax
    # simplest: patch the symbol used inside mixed.py
    import plate_inverse_problem_tpu.ops.mixed as mixed_mod
    mixed_mod.jax = jax  # unchanged; we patch lax.while_loop locally below

    class _LaxShim:
        def __getattr__(self, k):
            if k == "while_loop":
                return fixed_while
            return getattr(jax.lax, k)

    class _JaxShim:
        def __getattr__(self, k):
            if k == "lax":
                return _LaxShim()
            return getattr(jax, k)

    mixed_mod.jax = _JaxShim()

rj_d = jnp.asarray(rows)
cj_d = jnp.asarray(cols)
od = dict(Ks=jnp.asarray(Ks), Ms=jnp.asarray(Ms), W64=jnp.asarray(W64),
          invK32=jnp.asarray(invK32), fIn=jnp.asarray(fIn), c=jnp.asarray(c))


def sweep(params, od, oms):
    K_re = params[0] * od["Ks"] + params[1] * od["Ms"] * 0.0
    K_im = params[2] * 1e-2 * K_re
    om2 = (oms ** 2)[:, None]
    B_re = jnp.broadcast_to(od["fIn"][None, :], (oms.shape[0], n)) * 1.0
    B_im = -om2 * jnp.broadcast_to(od["fIn"][None, :], B_re.shape) * 0.0
    U_re, U_im = M.mixed_sweep(
        K_re, K_im, od["Ms"], B_re, B_im, oms, rj_d, cj_d, n,
        od["W64"], od["invK32"], n_refine=n_ref)
    y2 = (U_re @ od["c"]) ** 2 + (U_im @ od["c"]) ** 2
    return jnp.log(y2 + 1e-30)


def resid(params, od, oms):
    if chunk:
        cs = int(chunk)
        nc = F // cs
        def one(args):
            return sweep(params, od, args)
        return jax.lax.map(one, oms.reshape(nc, cs)).reshape(-1)
    return sweep(params, od, oms)


def rj_fn(params, od, oms):
    r = resid(params, od, oms)
    if not do_jac:
        return r
    J = jax.jacfwd(resid)(params, od, oms)
    return r, J


fn = jax.jit(rj_fn)
params = jnp.asarray([1.0, 0.0, 1.0])
oms_d = jnp.asarray(omegas)

print(f"n={n} F={F} loop={loop} nref={n_ref} chunk={chunk} jac={do_jac}",
      flush=True)
t0 = time.perf_counter()
out = fn(params, od, oms_d)
jax.block_until_ready(out)
t1 = time.perf_counter()
out = fn(params, od, oms_d)
jax.block_until_ready(out)
t2 = time.perf_counter()
print(f"first={t1-t0:.1f}s steady={t2-t1:.3f}s", flush=True)
