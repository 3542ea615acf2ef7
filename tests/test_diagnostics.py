"""Diagnostics: profiler trace capture (SURVEY §5)."""
def test_profiler_trace_capture(tmp_path):
    """diagnostics.profile.trace produces an XLA trace artifact
    (SURVEY §5 tracing row)."""
    import os
    import jax.numpy as jnp
    import jax
    from plate_inverse_problem_tpu.diagnostics.profile import profile_call

    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    out, run, dt = profile_call(fn, x, label="unit", logdir=str(tmp_path))
    assert float(out) == 64.0 * 64.0 * 64.0
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(run) for f in fs]
    assert files, "no trace artifacts written"
