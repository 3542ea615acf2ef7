"""FreeFEM ``.edp`` geometry import, end to end.

The reference executes user ``.edp`` scripts through FreeFEM
(/root/reference/source/jax_plate/Geometry.py:115-145); here the geometry
subset — parameters, parametric borders (holes, arcs), ``buildmesh``, the
script's own ``xtest``/``ytest`` readout point and its ``on(...)``
Dirichlet labels — is interpreted natively and meshed by the built-in
Delaunay mesher.  Accuracy of whatever engine ran the sweep can be audited
against a host f64 sparse-LU oracle at any time (diagnostics.oracle).

Run: python examples/edp_import.py
"""
import os
import tempfile

import numpy as np

import plate_inverse_problem_tpu as pip
from plate_inverse_problem_tpu.diagnostics import oracle_check

SCRIPT = """
// a plate with a circular hole, clamped on its RIGHT border (label 2 --
// note: not the templates' label 1; the on(...) clause below declares it)
real Lx = 90e-3; real Ly = 30e-3;
real r = 6e-3;
real xtest = 25e-3; real ytest = 5e-3;
int n = 8;
border Bl(t=0., 1){x=0;        y=Ly - t*Ly; label=0;}
border Bb(t=0., 1){x=Lx*t;     y=0;         label=0;}
border Br(t=0., 1){x=Lx;       y=t*Ly;      label=2;}
border Bt(t=0., 1){x=(1-t)*Lx; y=Ly;        label=0;}
border Hole(t=0., 2*pi){x=Lx/2 + r*cos(-t); y=Ly/2 + r*sin(-t); label=0;}
mesh Th = buildmesh(Bl(n) + Bb(3*n) + Br(n) + Bt(3*n) + Hole(2*n));
// the physics section is FreeFEM-specific and not interpreted -- but its
// on(...) labels ARE honored as the essential-BC location:
problem P(u, v) = ... + on(2, u=0, ux=0, uy=0);
"""


def main():
    fp = os.path.join(tempfile.mkdtemp(), "plate_with_hole.edp")
    with open(fp, "w") as fh:
        fh.write(SCRIPT)

    geom = pip.Geometry(fp, height=2e-3)
    print("clamped labels from the script's on(...):", geom.clamped_labels)
    print("readout point from the script's xtest/ytest:", geom.test_point)

    mat = pip.get_material(7920.0, "isotropic", E=200e9, G=75e9, beta=0.003)
    p = pip.Problem(geom, mat, None)        # pure-bending symmetric path
    print(f"meshed + assembled: n_free = {p.n_free}, "
          f"nnz = {p.op.pattern.nnz}")

    freqs = np.linspace(60.0, 900.0, 121)
    fr = p.solveForward(freqs)
    i_peak = int(np.argmax(np.abs(fr)))
    print(f"first in-band resonance near {freqs[i_peak]:.0f} Hz, "
          f"|FRF| peak {abs(fr[i_peak]):.3e}")

    audit = oracle_check(p, freqs, fr=fr)
    print(f"engine '{audit['engine']}' worst rel err vs f64 splu oracle: "
          f"{audit['worst_rel_err']:.2e} (at {audit['at_hz']:.0f} Hz)")


if __name__ == "__main__":
    main()
