"""FRF mesh-convergence study (CPU): first-resonance location vs refinement.

Evidence for the README claim that the reference's golden checksums are
discretisation-bound: the resonance frequencies shift O(h^2) with the mesh,
and Q~300 peaks make sum|FR| hyper-sensitive to those shifts.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import plate_inverse_problem_tpu as pip
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from plate_inverse_problem_tpu.fem.assembly import MODULI_INDICES

acc = pip.Accelerometer("AP1030")
mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)

print("symm template (basics.py config): first 3 resonances vs mesh")
for label, kw in [("ny=1", dict(ny=1)), ("ny=2", dict(ny=2)),
                  ("ny=3 (reference default)", dict(ny=3)),
                  ("ny=3 refine=1.5", dict(ny=3, refine=1.5))]:
    geom = pip.Geometry("symm", acc,
                        pip.GeometryParams(100e-3, 20e-3, 2e-3, 10e-3, None), **kw)
    p = pip.Problem(geom, mat, acc)
    op = p.op
    n = p.n_free
    Av, Bv, Dv = (np.asarray(x) for x in
                  mat.get_ABD_transform(geom.height)(np.asarray(p.parameters), 0.0))
    K = sum(Av[i].real * op.mats["A" + s] + Dv[i].real * op.mats["D" + s]
            for i, s in enumerate(MODULI_INDICES))
    Ksp = sp.csc_matrix((K, (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    Msp = sp.csc_matrix((np.asarray(p.MInertia),
                         (op.pattern.rows, op.pattern.cols)), shape=(n, n))
    lam = np.sort(spla.eigsh(Ksp, k=4, M=Msp, sigma=0, which="LM",
                             return_eigenvectors=False))
    f = np.sqrt(lam[:3]) / (2 * np.pi)
    print(f"  {label:28s} n_free={n:6d}  f1..f3 = "
          + "  ".join(f"{v:8.3f}" for v in f), flush=True)
