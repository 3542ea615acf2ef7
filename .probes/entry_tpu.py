import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import __graft_entry__ as ge

t0 = time.perf_counter()
fn, args = ge.entry()
print(f"entry built in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print(f"entry compiled+ran in {time.perf_counter()-t0:.1f}s; "
      f"finite={bool(np.all(np.isfinite(np.asarray(out))))} shape={out.shape}",
      flush=True)
