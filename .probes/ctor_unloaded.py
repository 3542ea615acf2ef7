"""Unloaded host ctor timing per tier (VERDICT r4 item 7).

The 46k row in SCALE.md recorded 76.8 s measured while the CPU test
suite ran on the same single-core host; re-measure each tier's
Problem() build (ARPACK band basis + MG hierarchy + RCM layout) with
nothing else running.  Pure host work — forced CPU platform.
"""
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")

import plate_inverse_problem_tpu as pip  # noqa: E402

REFINE = float(os.environ.get("REFINE", "4"))

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc, engine="mixed")   # the chip engine's build
dt = time.perf_counter() - t0
print("engine:", p._engine(), flush=True)
t0 = time.perf_counter()
p.getFRCore()          # lazy host build: ARPACK band basis + MG + RCM
dt_core = time.perf_counter() - t0
rec = {"refine": REFINE, "n_free": int(p.n_free),
       "assembly_unloaded_s": round(dt, 1),
       "core_build_unloaded_s": round(dt_core, 1),
       "ctor_unloaded_s": round(dt + dt_core, 1)}
print(json.dumps(rec), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "ctor_unloaded.jsonl"), "a") as f:
    f.write(json.dumps(rec) + "\n")
