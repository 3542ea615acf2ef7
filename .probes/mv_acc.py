"""Accuracy of the TPU f64 operator applications (band layout vs scatter)
against exact host arithmetic, at the REFINE tier."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.ops.scatter import spmv_flat
from plate_inverse_problem_tpu.ops.band import band_mv, flat_to_band

REFINE = float(os.environ.get("REFINE", "4"))
acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=REFINE)
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc, engine='mixed')
core, od = p.getFRCore()
n = p.n_free
th = jnp.asarray(np.asarray(p.parameters), jnp.float64)
transform = mat.get_ABD_transform_split(geom.height)
(Are, _), (Bre, _), (Dre, _) = transform(th, 0.0)
Cre = np.stack([np.asarray(Are), np.asarray(Bre), np.asarray(Dre)])
K_re = np.einsum('mk,mkn->n', Cre, np.asarray(od['ABD']))
rows = np.asarray(od['rows']); cols = np.asarray(od['cols'])
Ksp = sp.csc_matrix((K_re, (rows, cols)), shape=(n, n))

rng = np.random.default_rng(0)
xs = rng.standard_normal((4, n))
Y_host = (Ksp @ xs.T).T

Kj = jnp.asarray(K_re)
xj = jnp.asarray(xs)

y_sc = np.asarray(spmv_flat(Kj, od['rows'], od['cols'], xj, n))
# per-component relative error (amplification acts componentwise through
# the modal frame, so max matters, not just the norm)
den = np.abs(Y_host) + np.abs(Y_host).max(axis=1, keepdims=True) * 1e-30
e_sc = np.abs(y_sc - Y_host)
print(f'scatter f64: norm rel {np.linalg.norm(y_sc - Y_host)/np.linalg.norm(Y_host):.2e} '
      f'max-abs/||y||_inf {e_sc.max()/np.abs(Y_host).max():.2e}', flush=True)

lay = p._band_layout
if lay is not None:
    Kband = flat_to_band(Kj, lay, od['band_lin'])
    y_bd = np.asarray(band_mv(Kband, xj, lay))
    e_bd = np.abs(y_bd - Y_host)
    print(f'band f64:    norm rel {np.linalg.norm(y_bd - Y_host)/np.linalg.norm(Y_host):.2e} '
          f'max-abs/||y||_inf {e_bd.max()/np.abs(Y_host).max():.2e}', flush=True)
else:
    print('no band layout at this tier', flush=True)
