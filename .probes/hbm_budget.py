"""HBM budget audit for the scale tier: build the Problem on CPU and
inventory every opdata array + the solver's transient buffers, so the
100k-DOF chip run is sized before spending TPU time (v5e has 15.75 GB).

env REFINE (default 8 ~ 82k DOF).
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402

REFINE = float(os.environ.get("REFINE", "8"))

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)

t0 = time.perf_counter()
p = pip.Problem(geom, mat, acc, engine="mixed")
t_ctor = time.perf_counter() - t0
print(f"ctor {t_ctor:.1f}s n_free={p.n_free} nnz={p.op.pattern.nnz}",
      flush=True)

t0 = time.perf_counter()
core, od = p.getFRCore()
print(f"getFRCore (host prep) {time.perf_counter() - t0:.1f}s", flush=True)

sizes = []


def walk(prefix, obj):
    if isinstance(obj, dict):
        for k, v in obj.items():
            walk(f"{prefix}.{k}" if prefix else str(k), v)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            walk(f"{prefix}[{i}]", v)
    elif hasattr(obj, "nbytes") and hasattr(obj, "dtype"):
        sizes.append((obj.nbytes, prefix, obj.dtype, getattr(obj, "shape", ())))


walk("", od)
sizes.sort(reverse=True)
tot = sum(s for s, *_ in sizes)
print(f"\nopdata total: {tot/2**30:.2f} GiB in {len(sizes)} arrays")
for s, name, dt, shp in sizes[:25]:
    print(f"  {s/2**20:9.1f} MiB  {name:42s} {dt} {shp}")

# transient solver buffers at sweep time (per device call), using the real
# auto freq_chunk policy (problem.py ~line 852)
n = p.n_free
nnz = p.op.pattern.nnz
fc = p.freq_chunk
if fc is None and nnz > 300_000:
    per_lane = (4.0 * p.n_refine + 6.0) * n * 8.0
    fc = int(np.clip(2 ** np.floor(np.log2(max(2.0e9 / per_lane, 4.0))), 4, 64))
chunk = fc or 512
lay = p._band_layout
print(f"\ncall segment={p._call_segment()} freq_chunk={fc} "
      f"band layout: {None if lay is None else (lay.nb, lay.b)}")
k = 8
items = [
    ("V basis f64 (k+1,chunk,2,n)", (k + 1) * chunk * 2 * n * 8),
    ("Z basis f64 (k+1,chunk,2,n)", (k + 1) * chunk * 2 * n * 8),
    ("solution/residual stacks (~6x chunk,2,n f64)", 6 * chunk * 2 * n * 8),
]
if lay is not None:
    items += [
        ("K band f64 (nb,b,3b) per theta", lay.nb * lay.b * 3 * lay.b * 8),
        ("M band f64 (nb,b,3b)", lay.nb * lay.b * 3 * lay.b * 8),
    ]
tot_t = 0
for name, nb_ in items:
    tot_t += nb_
    print(f"  {nb_/2**30:6.2f} GiB  {name}")
print(f"transient total ~{tot_t/2**30:.2f} GiB; grand total "
      f"~{(tot_t+tot)/2**30:.2f} GiB of 15.75 GiB HBM")
