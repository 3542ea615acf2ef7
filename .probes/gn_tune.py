"""GN r+J overhead decomposition at a tier (VERDICT r3 task 3).

Measured round-3: 63.16 s/iter vs 9.04 s/sweep at n=21k = 7.0
sweep-equivalents for work that should cost ~4 (primal + 3 JVP lanes).
This probe isolates where the extra ~1.75x goes:

  a) sweep 512 steady (baseline, chunk=64)            -> C_sweep
  b) sweep 512 with chunk=32 (the GN chunk)           -> batch-invariance tax
  c) one 64-freq rj segment steady (chunk=32)         -> per-segment cost
  d) one 64-freq rj segment steady (chunk=64)         -> chunk-size effect
  e) full 512 rj, call_seg=512 (1 call), chunk=64     -> no segmentation
  f) full 512 rj, default settings                    -> reproduces 63 s

Appends JSON lines to .probes/gn_tune_results.jsonl.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.models.problem import ResidualFunction

REFINE = float(os.environ.get("REFINE", "4"))
F = int(os.environ.get("NFREQ", "512"))
ONLY = os.environ.get("ONLY", "")  # comma-separated subset of abcdef

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc)
print(f'n_free={p.n_free} nnz={p.op.pattern.nnz}', flush=True)
print(f'defaults: call_seg(jac)={p._call_segment(jac=True)} '
      f'chunk(l=1)={p._auto_freq_chunk(1)} chunk(l=4)={p._auto_freq_chunk(4)}',
      flush=True)

freqs = np.linspace(40, 600, F)
th = jnp.asarray(np.asarray(p.parameters), jnp.float64)
th2 = th * jnp.asarray([1.02, 1.01, 1.1])
core, od = p.getFRCore()

out = {"refine": REFINE, "n_free": int(p.n_free), "freqs": F}


def run(tag, fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    t2 = time.perf_counter()
    out[tag] = {"first_s": round(t1 - t0, 1), "steady_s": round(t2 - t1, 2)}
    print(f'{tag}: first={t1 - t0:.1f}s steady={t2 - t1:.2f}s', flush=True)
    return r


def want(k):
    return not ONLY or k in ONLY.split(",")


fr = None
if want("a"):
    fn = p.getFRFunction()
    fr = run("a_sweep512_c64", fn, jnp.asarray(freqs), th)
if fr is None:
    fr = p.getFRFunction()(jnp.asarray(freqs), th)
    jax.block_until_ready(fr)
ref = np.asarray(fr)

if want("b"):
    p2 = p
    old = p.freq_chunk
    p._fr_fn_memo = None
    p.freq_chunk = 32
    fn32 = p.getFRFunction()
    run("b_sweep512_c32", fn32, jnp.asarray(freqs), th)
    p.freq_chunk = old
    p._fr_fn_memo = None

if want("c"):
    rf = ResidualFunction(core, od, freqs[:64], ref[:64], "log_afc",
                          None, freq_chunk=32, call_seg=None)
    run("c_rj64_c32", rf.value_and_jac, th2)

if want("d"):
    rf = ResidualFunction(core, od, freqs[:64], ref[:64], "log_afc",
                          None, freq_chunk=64, call_seg=None)
    run("d_rj64_c64", rf.value_and_jac, th2)

if want("e"):
    rf = ResidualFunction(core, od, freqs, ref, "log_afc",
                          None, freq_chunk=64, call_seg=None)
    run("e_rj512_c64_seg512", rf.value_and_jac, th2)

if want("f"):
    rf = p.getResidualFunction(freqs, ref, kind='log_afc', jac_mode='fwd')
    run("f_rj512_fwd", rf.value_and_jac, th2)

if want("g"):
    rf = p.getResidualFunction(freqs, ref, kind='log_afc')  # auto -> adjoint
    out["g_mode"] = rf.jac_mode
    rg, Jg = run("g_rj512_adjoint", rf.value_and_jac, th2)
    # cross-check the adjoint Jacobian against the fwd one ON CHIP
    if want("f") or os.environ.get("XCHECK", "") == "1":
        rf_f = p.getResidualFunction(freqs, ref, kind='log_afc',
                                     jac_mode='fwd')
        rfwd, Jfwd = rf_f.value_and_jac(th2)
        dJ = float(jnp.max(jnp.abs(Jg - Jfwd) /
                           jnp.maximum(jnp.abs(Jfwd), 1e-30)))
        out["adjoint_vs_fwd_relJ"] = dJ
        print(f'adjoint vs fwd max rel J diff: {dJ:.2e}', flush=True)

with open(os.path.join(os.path.dirname(__file__),
                       "gn_tune_results.jsonl"), "a") as fh:
    fh.write(json.dumps(out) + "\n")
print("RECORD", json.dumps(out), flush=True)
