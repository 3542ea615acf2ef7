"""Measure the f64 direct-solve noise floor at the 104k tier resonance:
(a) splu COLAMD vs MMD_AT_PLUS_A ordering readout difference,
(b) size of one f64 iterative-refinement correction on the splu solution.
If these are ~the engine-vs-splu difference (1.4e-6), the observed gap is
the f64 floor at this conditioning, not engine error."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

import plate_inverse_problem_tpu as pip  # noqa: E402
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES  # noqa: E402

acc = pip.Accelerometer("AP1030")
geom = pip.Geometry("sh_i", acc,
                    pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None),
                    refine=9.0)
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=.003)
p = pip.Problem(geom, mat, acc, engine="mixed")
op = p.op
n = p.n_free
print("n =", n, flush=True)

th = np.asarray(p.parameters, np.float64)
Av, Bv, Dv = (np.asarray(x) for x in mat.get_ABD_transform(geom.height)(th, 0.0))
K_flat = sum(Av[i] * op.mats["A" + s] + Bv[i] * op.mats["B" + s]
             + Dv[i] * op.mats["D" + s] for i, s in enumerate(MODULI_INDICES))
bK = sum(Av[i] * op.lifts["A" + s] + Bv[i] * op.lifts["B" + s]
         + Dv[i] * op.lifts["D" + s] for i, s in enumerate(MODULI_INDICES))
rows, cols = op.pattern.rows, op.pattern.cols
Kc = sp.csc_matrix((K_flat, (rows, cols)), shape=(n, n))
Mc = sp.csc_matrix((np.asarray(p.MInertia).astype(complex), (rows, cols)),
                   shape=(n, n))
fIn = np.asarray(p.fInertia)


def row(nm):
    R, r0 = op.readout[nm]
    return R.mean(axis=0), r0.mean()


cu, ou = row("u"); cv, ov = row("v"); cw, ow = row("w")
cwx, owx = row("wx"); cwy, owy = row("wy")
eff = acc.effective_height * acc.height
ts = acc.transverse_sensitivity


def readout(u):
    uu = (cu - eff * cwx) @ u + (ou - eff * owx)
    vv = (cv - eff * cwy) @ u + (ov - eff * owy)
    ww = cw @ u + ow
    return np.sqrt((abs(uu) * ts) ** 2 + (abs(vv) * ts) ** 2 + abs(ww) ** 2)


for f in (160.0, 123.4):
    om = 2 * np.pi * f
    A = (Kc - om ** 2 * Mc).tocsc()
    b = bK - om ** 2 * fIn
    lu1 = spla.splu(A, permc_spec="COLAMD")
    u1 = lu1.solve(b)
    # independent rounding path: factor A^T, solve with trans='T'
    lu2 = spla.splu(A.T.tocsc(), permc_spec="COLAMD")
    u2 = lu2.solve(b, trans="T")
    r1, r2 = readout(u1), readout(u2)
    print(f"f={f}: |A-path vs A^T-path| readout rel = "
          f"{abs(r1-r2)/abs(r1):.2e}", flush=True)
    # refinement correction of the direct solution
    res = b - A @ u1
    du = lu1.solve(res)
    r1c = readout(u1 + du)
    print(f"f={f}: splu self-refinement readout shift = "
          f"{abs(r1c-r1)/abs(r1):.2e}; solution-space |du|/|u| = "
          f"{np.linalg.norm(du)/np.linalg.norm(u1):.2e}", flush=True)
    # refined-splu as better oracle: engine error vs u1+du
    import jax.numpy as jnp
    fr_e = np.asarray(p.getFRFunction()(jnp.asarray(np.array([f])),
                                        jnp.asarray(th, jnp.float64)))[0]
    print(f"f={f}: engine vs splu {abs(fr_e-r1)/abs(r1):.2e}, "
          f"vs REFINED splu {abs(fr_e-r1c)/abs(r1c):.2e}", flush=True)
