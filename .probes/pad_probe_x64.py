import time, numpy as np, jax, jax.numpy as jnp
import jax; jax.config.update("jax_enable_x64", True)
rng = np.random.default_rng(0)
for n in (1536, 1466):
    K = rng.standard_normal((n, n)).astype(np.float32) + n*np.eye(n, dtype=np.float32)
    Kc = (K + 1j*0.01*K).astype(np.complex64)
    M = np.eye(n, dtype=np.complex64)
    F = 64
    oms = np.linspace(0.5, 1.5, F).astype(np.float32)
    B = (rng.standard_normal((F, n)) + 1j*rng.standard_normal((F, n))).astype(np.complex64)
    def sweep(Kd, Md, oms, B):
        def one(args):
            om, b = args
            return jnp.linalg.solve(Kd - om**2*Md, b)
        return jax.lax.map(one, (oms, B), batch_size=16)
    f = jax.jit(sweep)
    t0=time.perf_counter(); u=f(Kc, M, oms, B); jax.block_until_ready(u)
    t1=time.perf_counter(); u=f(Kc, M, oms, B); jax.block_until_ready(u)
    t2=time.perf_counter()
    print(f'n={n}: first={t1-t0:.1f}s steady={t2-t1:.3f}s -> {F/(t2-t1):.0f} solves/s', flush=True)
