"""Benchmark: FRF solves/sec/chip over a 512-frequency sweep.

North-star metric from BASELINE.json.  The baseline is the reference's
compute recipe — one sparse LU factorization + solve per frequency (UMFPACK
via InnerState.h:240-305) — executed here with scipy.sparse.linalg.splu on
the *same reduced system* on the host CPU, extrapolated to the full sweep.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec/chip", "vs_baseline": N}
Progress/diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_BASE_ARGS = None


def _baseline_init(Kcsc, Mcsc, bK, fIn):
    """Pool initializer: receives the CSC system via spawn-pickling."""
    global _BASE_ARGS
    _BASE_ARGS = (Kcsc, Mcsc, bK, fIn)


def _baseline_solve(f):
    """One reference-recipe solve (sparse LU + triangular solves) — worker
    for the all-cores baseline pool."""
    import scipy.sparse.linalg as spla

    Kcsc, Mcsc, bK, fIn = _BASE_ARGS
    om = 2 * np.pi * f
    lu = spla.splu((Kcsc - om ** 2 * Mcsc).tocsc())
    return lu.solve(bK - om ** 2 * fIn)[:1]


def _tpu_reachable(timeout_s: float | None = None) -> bool:
    """Probe the TPU platform in a SUBPROCESS with a hard timeout: a dead
    axon tunnel hangs client creation indefinitely (observed 2026-08-18),
    which would hang the whole benchmark rather than fail it."""
    import os
    import subprocess

    if os.environ.get("PIP_BENCH_FORCE_CPU") == "1":
        return False
    if timeout_s is None:
        timeout_s = float(os.environ.get("PIP_BENCH_PROBE_TIMEOUT", "240"))
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 8)); "
             "print('OK', float((x @ x).sum()))")
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=timeout_s)
        return r.returncode == 0 and "OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _tpu_reachable():
        # honest fallback: a CPU number labeled as such beats a hang; the
        # JSON carries backend/precision so the artifact is self-describing
        log("TPU platform unreachable (probe timed out) — falling back to "
            "the CPU backend")
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    # persistent compilation cache: amortizes XLA compiles across bench runs.
    # PIP_TPU_CACHE_DIR (same env var config.py honors) lets a cold-compile
    # measurement point at a scratch dir without clobbering the warm cache.
    import os as _os_cache
    _cache_dir = _os_cache.environ.get("PIP_TPU_CACHE_DIR",
                                       "/tmp/pip_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    import plate_inverse_problem_tpu as pip
    from plate_inverse_problem_tpu.config import default_precision

    backend = jax.default_backend()
    prec = default_precision()
    log(f"backend={backend} devices={jax.devices()} precision={prec.name}")

    # ---- problem: sh_i strip, refined to a production-ish DOF count --------
    acc = pip.Accelerometer("AP1030")
    geom = pip.Geometry(
        "sh_i", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
        refine=1.0,
    )
    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

    t0 = time.perf_counter()
    p = pip.Problem(geom, mat, acc)
    log(f"assembly: n_free={p.n_free} nnz={p.op.pattern.nnz} "
        f"({time.perf_counter() - t0:.2f}s)")

    log(f"engine: {p._engine()}")
    N_F = 512
    freqs = np.linspace(40.0, 600.0, N_F)
    fr_fn = p.getFRFunction()
    # frequencies stay f64: the mixed engine squares them in f64, and an f32
    # omega alone costs ~3e-5 relative at resonance peaks
    fj = jnp.asarray(freqs)
    # theta stays f64 too: the material transform evaluates in split f64,
    # and an f32-truncated theta alone costs ~2e-6 relative at resonance
    # peaks (coefficient rounding amplified by the modal Q)
    th = jnp.asarray(np.asarray(p.parameters), jnp.float64)

    import glob as _glob
    cache_before = len(_glob.glob(_cache_dir + "/*"))
    # phase-decomposed first call on the same core program the public
    # wrapper jits: trace+lower (host Python) / compile (XLA compile on a
    # cold cache; executable deserialize + device load on a warm one) /
    # first run.  The public wrapper reuses this jit cache entry, so the
    # public-path first call below stays cheap and the phases are honest.
    core, od = p.getFRCore()
    jc = jax.jit(core)
    t0 = time.perf_counter()
    lowered = jc.lower(fj, th, od)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    compile_only_s = time.perf_counter() - t0
    # public-path first call (comparable with earlier rounds: includes
    # whatever the phase probe above did not already warm)
    t0 = time.perf_counter()
    fr = fr_fn(fj, th)
    jax.block_until_ready(fr)
    first_public_s = time.perf_counter() - t0
    compile_s = lower_s + compile_only_s + first_public_s
    cache_after = len(_glob.glob(_cache_dir + "/*"))
    # self-describing compile state: new cache entries => this first call
    # paid a real XLA compile (cold); none => persistent-cache hit (warm)
    compile_state = "cold" if cache_after > cache_before else "warm"
    log(f"first call (incl. compile): {compile_s:.2f}s [{compile_state}: "
        f"lower {lower_s:.2f}s, compile/load {compile_only_s:.2f}s, "
        f"public first call {first_public_s:.2f}s; persistent cache "
        f"{cache_before} -> {cache_after} entries]")

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        fr = fr_fn(fj, th)
    jax.block_until_ready(fr)
    per_sweep = (time.perf_counter() - t0) / iters
    solves_per_sec = N_F / per_sweep
    log(f"steady-state sweep: {per_sweep*1e3:.1f} ms -> "
        f"{solves_per_sec:.1f} solves/s/chip")
    checksum = float(np.sum(np.abs(np.asarray(fr))))
    log(f"FR checksum: {checksum:.6f}")

    # ---- baseline: per-frequency sparse LU on the same system (CPU) --------
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    op = p.op
    from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

    # evaluate the (f64, complex128) transform on the host CPU device
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        Av, Bv, Dv = (
            np.asarray(x)
            for x in mat.get_ABD_transform(geom.height)(
                np.asarray(p.parameters), 0.0
            )
        )
    K_flat = np.zeros(op.pattern.nnz, dtype=np.complex128)
    bK = np.zeros(p.n_free, dtype=np.complex128)
    for i, s in enumerate(MODULI_INDICES):
        K_flat += Av[i] * op.mats["A" + s] + Bv[i] * op.mats["B" + s] + Dv[i] * op.mats["D" + s]
        bK += Av[i] * op.lifts["A" + s] + Bv[i] * op.lifts["B" + s] + Dv[i] * op.lifts["D" + s]
    M_flat = np.asarray(p.MInertia)
    fIn = np.asarray(p.fInertia)

    Kcsc = sp.csc_matrix(
        (K_flat, (op.pattern.rows, op.pattern.cols)), shape=(p.n_free, p.n_free)
    )
    Mcsc = sp.csc_matrix(
        (M_flat.astype(np.complex128), (op.pattern.rows, op.pattern.cols)),
        shape=(p.n_free, p.n_free),
    )

    n_base = 8
    t0 = time.perf_counter()
    for f in freqs[:n_base]:
        om = 2 * np.pi * f
        A = (Kcsc - om**2 * Mcsc).tocsc()
        lu = spla.splu(A)
        u = lu.solve(bK - om**2 * fIn)
    base_per_solve = (time.perf_counter() - t0) / n_base
    base_solves_per_sec = 1.0 / base_per_solve
    log(f"baseline (scipy splu, 1 thread): {base_per_solve*1e3:.1f} ms/solve "
        f"-> {base_solves_per_sec:.1f} solves/s")

    # The reference's UMFPACK loop runs on ALL host cores (cpu=0 default,
    # InnerState.h:251-304) — reproduce that with a process pool over
    # frequencies so vs_baseline compares chip vs whole host, not chip vs
    # one core.
    import os as _os
    n_cores = _os.cpu_count() or 1
    n_workers = min(n_cores, 16)
    base_mc_solves_per_sec = base_solves_per_sec
    baseline_label = f"scipy splu, 1 core (host has {n_cores})"
    if n_workers > 1:
        try:
            import multiprocessing as _mp

            n_jobs = 2 * n_workers
            # 'spawn', not 'fork': forking after the TPU client holds its
            # device lock can deadlock inside the child rather than raise
            ctx = _mp.get_context("spawn")
            with ctx.Pool(n_workers, initializer=_baseline_init,
                          initargs=(Kcsc, Mcsc, bK, fIn)) as pool:
                # warm up OUTSIDE the timed window: interpreter spawn,
                # module imports and CSC unpickling are startup cost, not
                # solve cost — timing them would deflate the baseline and
                # inflate vs_baseline
                pool.map(_baseline_solve, freqs[:n_workers])
                t0 = time.perf_counter()
                pool.map(_baseline_solve, freqs[:n_jobs])
                base_mc_solves_per_sec = n_jobs / (time.perf_counter() - t0)
            baseline_label = f"scipy splu pool, {n_workers}/{n_cores} cores"
            log(f"baseline (scipy splu, {n_workers} procs): "
                f"{base_mc_solves_per_sec:.1f} solves/s")
        except Exception as err:
            log(f"multicore baseline skipped ({err})")
    else:
        log("single-core host: all-cores baseline == 1-thread baseline")

    # correctness cross-check at the readout level vs the f64 sparse-LU
    # oracle — includes the resonance peak (the hardest point)
    def readout_row(name):
        R, r0 = op.readout[name]
        return R.mean(axis=0), r0.mean()

    cu, ou = readout_row("u")
    cv, ov = readout_row("v")
    cw, ow = readout_row("w")
    cwx, owx = readout_row("wx")
    cwy, owy = readout_row("wy")
    eff = acc.effective_height * acc.height
    ts = acc.transverse_sensitivity
    fr_np = np.asarray(fr)
    idxs = [3, int(np.argmax(fr_np)), N_F // 2, N_F - 1]
    oracle = {}
    for i in idxs:
        om = 2 * np.pi * freqs[i]
        u_full = spla.splu((Kcsc - om**2 * Mcsc).tocsc()).solve(bK - om**2 * fIn)
        uu = (cu - eff * cwx) @ u_full + (ou - eff * owx)
        vv = (cv - eff * cwy) @ u_full + (ov - eff * owy)
        ww = cw @ u_full + ow
        oracle[i] = np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)
    rel = max(abs(fr_np[i] - oracle[i]) / abs(oracle[i]) for i in idxs)
    log(f"{p._engine()} engine worst rel err vs f64 splu (incl. peak): {rel:.2e}")

    # On endpoint-outage rounds the fallback benches whatever engine the CPU
    # default resolves to (modal at this size) — which exercises none of the
    # chip code path.  Add a forced mixed-engine row so the TPU engine's
    # numerics + throughput still get a regression signal on CPU-only rounds.
    cpu_mixed = None
    if backend != "tpu" and p._engine() != "mixed":
        try:
            p_m = pip.Problem(geom, mat, acc, engine="mixed")
            fr_m_fn = p_m.getFRFunction()
            t0 = time.perf_counter()
            fr_m = fr_m_fn(fj, th)
            jax.block_until_ready(fr_m)
            first_m = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2):
                fr_m = fr_m_fn(fj, th)
            jax.block_until_ready(fr_m)
            sweep_m = (time.perf_counter() - t0) / 2
            fr_m_np = np.asarray(fr_m)
            rel_m = max(abs(fr_m_np[i] - oracle[i]) / abs(oracle[i])
                        for i in idxs)
            cpu_mixed = {
                "solves_per_sec": round(N_F / sweep_m, 2),
                "first_call_s": round(first_m, 2),
                "worst_rel_err_vs_f64_splu": float(rel_m),
            }
            log(f"cpu mixed-engine row: {N_F / sweep_m:.1f} solves/s, "
                f"worst rel err {rel_m:.2e}")
        except Exception as err:
            log(f"cpu mixed-engine row skipped ({err})")

    out = {
        "metric": "FRF solves/sec/chip (512-freq sweep, sh_i plate, "
                  f"n_free={p.n_free})",
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec/chip",
        # chip vs the reference recipe on the WHOLE host (all-cores LU pool,
        # matching UMFPACK cpu=0); the 1-thread number is also reported
        "vs_baseline": round(solves_per_sec / base_mc_solves_per_sec, 3),
        "extra": {
            "sweep_ms": round(per_sweep * 1e3, 2),
            "compile_s": round(compile_s, 2),
            "compile_state": compile_state,
            "first_call_lower_s": round(lower_s, 2),
            "first_call_compile_or_load_s": round(compile_only_s, 2),
            "first_call_public_s": round(first_public_s, 2),
            "baseline_solves_per_sec_1thread": round(base_solves_per_sec, 2),
            "baseline_solves_per_sec_allcores": round(base_mc_solves_per_sec, 2),
            "baseline_label": baseline_label,
            "host_cores": n_cores,
            "engine": p._engine(),
            "worst_rel_err_vs_f64_splu": float(rel),
            "checksum": checksum,
            "backend": backend,
            "precision": prec.name,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
