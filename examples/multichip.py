"""Multi-chip frequency-sweep scaling demo.

Shards the sweep and a full inverse-iteration step over all visible devices
(`freq` x `dof` mesh).  Runs identically on a TPU pod slice and on a CPU host
with virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip.py
"""
# allow running from a source checkout: python examples/<name>.py
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.parallel import (
    make_mesh, shard_frequencies, sharded_fr_function, sharded_train_step,
)

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("symm", acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), ny=2)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
p = pip.Problem(geom, mat, acc)

n_dev = len(jax.devices())
mesh = make_mesh(dof_axis=2 if n_dev % 2 == 0 and n_dev >= 4 else 1)
print(f"device mesh: {dict(mesh.shape)}")

freqs = np.linspace(40, 600, 64)
fs = shard_frequencies(mesh, jnp.asarray(freqs))
fn = sharded_fr_function(p, mesh)
fr = fn(fs, p.parameters)[: freqs.size]
print(f"sharded FRF sum: {float(np.sum(np.abs(np.asarray(fr)))):.4f}")

step = sharded_train_step(p, mesh)
ref = np.asarray(fr)
theta = p.parameters * jnp.asarray([1.05, 1.05, 1.2])
for it in range(3):
    loss, grad, theta = step(freqs, ref, theta)
    print(f"iter {it}: loss={float(loss):.6e}")

# Gauss-Newton over the mesh: the second-order inverse iteration — J rows
# shard over 'freq', the (p, p) normal-equation contractions psum across
# chips, the tiny damped solve runs on the host in f64.  With an 8-chip
# slice + FRF compression this is the BASELINE <60 s 100k-DOF recipe.
from plate_inverse_problem_tpu.parallel import sharded_gn_step

theta = p.parameters * jnp.asarray([1.05, 1.05, 1.2])
# Levenberg-Marquardt damping schedule: a full GN step overshoots from a
# 20% start on the resonant log-AFC residual, so accept a step only when
# |r|^2 drops, else retry with 10x damping
gn = sharded_gn_step(p, mesh, kind="log_afc")  # one compiled mesh program
# Levenberg-Marquardt: gn() returns |r|^2 at the CURRENT theta plus the
# proposed update, so acceptance is judged on the next evaluation — reject
# means re-proposing from the same theta with 10x damping
lam = 1e-2
rsq, theta_prop = gn(freqs, ref, theta, damping=lam)
for it in range(10):
    rsq_prop, theta_next = gn(freqs, ref, theta_prop, damping=lam)
    if rsq_prop <= rsq:            # accept the proposal
        theta, rsq, theta_prop = theta_prop, rsq_prop, theta_next
        lam = max(lam / 3.0, 1e-4)
        print(f"GN iter {it}: |r|^2={rsq:.6e} (lambda={lam:.0e})")
    else:                          # reject: damp harder from the same theta
        lam *= 10.0
        _, theta_prop = gn(freqs, ref, theta, damping=lam)
        print(f"GN iter {it}: rejected ({rsq_prop:.3e} > {rsq:.3e}), "
              f"lambda -> {lam:.0e}")
err = np.asarray(theta) / np.asarray(p.parameters) - 1
print(f"recovered param rel err: {np.array2string(err, precision=2)}")
