"""Morley nonconforming C1 plate element, built numerically per element.

The Morley triangle (the ``P2Morley`` space FreeFEM provides the reference,
pyFFInterface.py:28) is the full quadratic space P2 on each triangle with DOFs

* ``w(v_i)`` at the three vertices,
* ``dw/dn (m_i)`` at the three edge midpoints, with a *globally oriented*
  unit normal per edge so the DOF is single-valued across elements.

We construct the basis numerically: in centered+scaled local coordinates the
6x6 generalized Vandermonde ``G[d, k] = DOF_d(monomial_k)`` is inverted
(vmapped ``jnp.linalg.inv``), giving exact polynomial coefficients.  Because
the basis is quadratic its second derivatives are constant per element, so
every bending stiffness integral is a closed-form area-weighted product — no
quadrature error, and the whole computation is dense linear algebra that maps
straight onto the TPU vector/matrix units.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.core import TriangleMesh
from .quadrature import TRI_DEGREE5

# monomial exponents for {1, x, y, x^2, x*y, y^2}
_MONO_POW = np.array(
    [[0, 0], [1, 0], [0, 1], [2, 0], [1, 1], [0, 2]], dtype=np.int64
)


def _mono_eval(xy):
    """Evaluate the 6 monomials at points xy (..., 2) -> (..., 6)."""
    x, y = xy[..., 0], xy[..., 1]
    return jnp.stack(
        [jnp.ones_like(x), x, y, x * x, x * y, y * y], axis=-1
    )


def _mono_grad(xy):
    """Gradients of the 6 monomials at xy (..., 2) -> (..., 6, 2)."""
    x, y = xy[..., 0], xy[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    gx = jnp.stack([zero, one, zero, 2 * x, y, zero], axis=-1)
    gy = jnp.stack([zero, zero, one, zero, x, 2 * y], axis=-1)
    return jnp.stack([gx, gy], axis=-1)


def build_morley(mesh: TriangleMesh, quad=TRI_DEGREE5) -> dict:
    """Per-element Morley basis data, vmapped over all triangles.

    Returns a dict of numpy arrays:

    * ``dofs``   (T, 6) int32 — global DOF ids: 3 vertex ids then V + edge ids.
    * ``area``   (T,)
    * ``d2``     (T, 6, 3) — constant [d2/dx2, d2/dy2, d2/dxdy] per basis fn.
    * ``grad_q`` (T, Q, 6, 2) — basis gradients at quadrature points (global).
    * ``phi_q``  (T, Q, 6) — basis values at quadrature points.
    * ``xq``     (T, Q, 2) — quadrature point coordinates, ``wq`` (Q,) weights
      (unit weights; multiply by area).
    * ``C``, ``centroid``, ``scale`` — basis coefficients in scaled-local
      monomials for point evaluation (interpolation operators).
    """
    V = mesh.num_nodes
    tri = mesh.triangles
    coords = mesh.nodes[tri]  # (T, 3, 2)

    # global unit normal per unique edge (lower->higher vertex, rotated -90)
    ea = mesh.nodes[mesh.edges[:, 0]]
    eb = mesh.nodes[mesh.edges[:, 1]]
    t_vec = eb - ea
    t_len = np.linalg.norm(t_vec, axis=1, keepdims=True)
    n_global = np.stack([t_vec[:, 1], -t_vec[:, 0]], axis=1) / t_len  # (E, 2)

    tri_e = mesh.tri_edges  # (T, 3)
    n_loc = n_global[tri_e]  # (T, 3, 2) normal (global orientation) per local edge
    # midpoint of edge opposite local vertex i
    mids = 0.5 * (coords[:, [1, 2, 0]] + coords[:, [2, 0, 1]])  # (T, 3, 2)

    lam_q, w_q = quad
    lam_q = jnp.asarray(lam_q)

    def element(P, mid, n_g):
        c0 = jnp.mean(P, axis=0)
        area = 0.5 * jnp.abs(
            (P[1, 0] - P[0, 0]) * (P[2, 1] - P[0, 1])
            - (P[1, 1] - P[0, 1]) * (P[2, 0] - P[0, 0])
        )
        s = jnp.sqrt(area)  # local length scale for conditioning

        Pl = (P - c0) / s
        Ml = (mid - c0) / s

        # G rows: vertex values, then *global* normal derivatives at edge
        # midpoints.  The 1/s chain-rule factor is essential: the edge DOF is
        # shared between elements of different size, so its meaning must be
        # element-independent (d/dn in global coordinates).
        G_v = _mono_eval(Pl)  # (3, 6)
        gm = _mono_grad(Ml)  # (3, 6, 2)
        G_n = jnp.einsum("ikd,id->ik", gm, n_g) / s
        G = jnp.concatenate([G_v, G_n], axis=0)  # (6, 6)
        C = jnp.linalg.inv(G)  # columns = basis-fn monomial coefficients

        # constant second derivatives in global coords:
        # local d2 coeffs: xx -> 2*C[3], yy -> 2*C[5], xy -> C[4]; chain rule 1/s^2
        d2 = jnp.stack(
            [2.0 * C[3, :], 2.0 * C[5, :], C[4, :]], axis=-1
        ) / (s * s)  # (6, 3): [wxx, wyy, wxy]

        # quadrature points (global) and basis values / gradients there
        xq = lam_q @ P  # (Q, 2)
        xl = (xq - c0) / s
        phi_q = _mono_eval(xl) @ C  # (Q, 6)
        grad_q = jnp.einsum("qkd,kj->qjd", _mono_grad(xl), C) / s  # (Q, 6, 2)

        return C, c0, s, area, d2, phi_q, grad_q, xq

    # Assembly is init-time float64 work (exactness of element integrals);
    # pin it to the host CPU — the TPU compute path only ever sees the
    # assembled flat data, and TPUs lack f64 LU for the basis inversion.
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu0 = None
    with jax.default_device(cpu0):
        C, c0, s, area, d2, phi_q, grad_q, xq = jax.vmap(element)(
            jnp.asarray(coords), jnp.asarray(mids), jnp.asarray(n_loc)
        )

    dofs = np.concatenate([tri, V + tri_e], axis=1).astype(np.int32)  # (T, 6)

    return {
        "dofs": dofs,
        "area": np.asarray(area),
        "d2": np.asarray(d2),
        "phi_q": np.asarray(phi_q),
        "grad_q": np.asarray(grad_q),
        "xq": np.asarray(xq),
        "wq": np.asarray(w_q),
        "C": np.asarray(C),
        "centroid": np.asarray(c0),
        "scale": np.asarray(s),
        "n_dofs": V + mesh.num_edges,
    }


def morley_point_eval(mdata: dict, tri_idx: np.ndarray, points: np.ndarray):
    """Evaluate (w, w_x, w_y) basis rows at arbitrary points.

    Returns (vals, grads): vals (P, 6), grads (P, 6, 2) — contributions of the
    6 local basis functions of the containing element ``tri_idx[p]``.
    Used to build the static interpolation operators that replace FreeFEM's
    ``interpolate`` matrices (pyFFInterface.py:204-212).
    """
    C = mdata["C"][tri_idx]  # (P, 6, 6)
    c0 = mdata["centroid"][tri_idx]
    s = mdata["scale"][tri_idx]
    xl = (np.asarray(points) - c0) / s[:, None]

    vals = np.einsum("pk,pkj->pj", np.asarray(_mono_eval(jnp.asarray(xl))), C)
    grads = (
        np.einsum("pkd,pkj->pjd", np.asarray(_mono_grad(jnp.asarray(xl))), C)
        / s[:, None, None]
    )
    return vals, np.transpose(grads, (0, 1, 2))
