import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plate_inverse_problem_tpu.ops.jacobi_eigh import jacobi_eigh, generalized_jacobi_eigh

rng = np.random.default_rng(0)
for n in (1466, 2048):
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A + A.T
    t0 = time.perf_counter()
    lam, V = jacobi_eigh(jnp.asarray(A)); jax.block_until_ready((lam, V))
    t1 = time.perf_counter()
    lam, V = jacobi_eigh(jnp.asarray(A)); jax.block_until_ready((lam, V))
    t2 = time.perf_counter()
    lam, V = np.asarray(lam), np.asarray(V)
    lam_ref = np.linalg.eigvalsh(A.astype(np.float64))
    print(f"jacobi n={n}: first={t1-t0:.1f}s steady={t2-t1:.3f}s "
          f"eig_err={np.abs(lam-lam_ref).max()/np.abs(lam_ref).max():.2e} "
          f"orth={np.abs(V.T@V-np.eye(n)).max():.2e}", flush=True)

# generalized at FEM-like conditioning
n = 1466
B = rng.standard_normal((n, n)).astype(np.float32)
M = (B @ B.T / n + np.eye(n)).astype(np.float32)
K = (B + B.T).astype(np.float32)
t0 = time.perf_counter()
lam, Z = generalized_jacobi_eigh(jnp.asarray(K), jnp.asarray(M))
jax.block_until_ready((lam, Z))
t1 = time.perf_counter()
lam, Z = generalized_jacobi_eigh(jnp.asarray(K), jnp.asarray(M))
jax.block_until_ready((lam, Z))
t2 = time.perf_counter()
print(f"gen jacobi n={n}: first={t1-t0:.1f}s steady={t2-t1:.3f}s", flush=True)
