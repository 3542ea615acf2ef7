"""Constitutive models: parameter vector theta (+ frequency omega) -> complex moduli.

TPU-native re-design of the reference's ``jax_plate/Material.py``
(/root/reference/source/jax_plate/Material.py:25-994).  Same anisotropy-type
registry (ATYPES), same parameter orders, same public surface:

* ``get_D_transform(h)``  -> f(theta, omega) -> D_ij, order [11,12,16,22,26,66]
  (Material.py:124-145)
* ``get_ABD_transform(h)``-> f(theta, omega) -> (A_ij, B_ij, D_ij)
  (Material.py:101-122)
* constraint export for scipy optimizers (Material.py:205-264)
* JSON persistence + ``get_material`` factory (Material.py:331-354, 888-994)

Differences by design:

* Classical lamination theory for the SOL families is computed with a
  *closed-form numpy* Q->(A,B,D) linear map instead of sympy symbolic algebra
  (reference Material.py:660-741 builds the same 6x6 matrices symbolically).
  The map is linear, so we evaluate it on the 6 canonical basis vectors.
* Transforms are pure functions of ``jnp`` arrays, jit/vmap/grad-safe, with no
  Python closures over mutable state.
"""
from __future__ import annotations

import abc
import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax.tree_util import Partial
import numpy as np

from ..utils.paths import get_package_dir

ATYPES = {
    "isotropic": {"E", "G", "beta"},
    "orthotropic": {"E1", "E2", "G12", "nu12", "beta"},
    # each modulus has its own loss factor
    "orthotropic_d4": {"E1", "E2", "G12", "nu12", "b1", "b2", "b3", "b4"},
    # simple orthotropic laminate: identical unidirectional layers;
    # angles in DEGREES, counter-clockwise, starting from the lowest layer
    "sol": {"E1", "E2", "G12", "nu12", "beta", "angles"},
    "symm_sol": {"E1", "G12", "nu12", "beta", "angles"},
}

MODULI_ORDER = ("11", "12", "16", "22", "26", "66")


# ---------------------------------------------------------------------------
# Classical lamination theory, closed form (replaces sympy at Material.py:660-741)
# ---------------------------------------------------------------------------

def _pair_mul(a, b):
    """(re, im) pair product — split-complex arithmetic for f64-on-TPU."""
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _pair_div(a, b):
    d = b[0] * b[0] + b[1] * b[1]
    return ((a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d)


def _v2(x, companion: float = 1.0):
    """Lift a scalar into a (2,) vector for f64-EXACT arithmetic on TPU.

    The XLA:TPU backend compiles f64 elementwise chains whose outputs are
    single elements (0-d or shape (1,)) through a lossy scalar path
    (~2^-27 relative per op, measured: ``jit(lambda v: 1.0 - v*v)`` on a
    0-d f64 is 8.4e-9 off); the same chains on >=2-element arrays are
    exact to the f64-emulation precision (~1e-15).  Resonance Q-factors
    amplify coefficient errors ~300x into the FRF, so the material
    coefficient algebra must avoid the scalar path: every chain here runs
    on (2,) vectors and extracts lane 0 (:func:`_s0`) only when assembling
    the output arrays (scalar-times-vector products are full-size ops and
    therefore safe).

    The companion lane holds a DUMMY constant, not a broadcast copy —
    XLA sinks broadcast-then-op back to the lossy scalar form, while a
    genuinely different lane defeats the rewrite.  Pick ``companion`` so
    every intermediate of the particular chain stays finite (e.g. 0.25
    for Poisson ratios, keeping ``1 - nu12*nu21`` away from 0): non-finite
    companion-lane values are discarded by ``_s0`` in the primal but turn
    into NaN*0 contractions in reverse-mode AD.
    """
    x = jnp.asarray(x)
    return jnp.concatenate([x[None], jnp.full((1,), companion, x.dtype)])


def _s0(x):
    """Extract lane 0 of a :func:`_v2` chain (pure data movement — exact)."""
    return x[0]


def _qbar_components(Q6: np.ndarray, theta_deg: float) -> np.ndarray:
    """Rotate a lamina stiffness Q (Voigt order [11,12,16,22,26,66]) by theta.

    Uses the same rotation convention as the reference (Material.py:670-680):
    ``m = cos t``, ``n = -sin t`` with T = [[m^2, n^2, -2mn],
                                           [n^2, m^2,  2mn],
                                           [ mn, -mn, m^2-n^2]]
    and Qbar = T Q T^T.  Returns Qbar in the same 6-vector Voigt order.
    """
    Q = np.array(
        [
            [Q6[0], Q6[1], Q6[2]],
            [Q6[1], Q6[3], Q6[4]],
            [Q6[2], Q6[4], Q6[5]],
        ]
    )
    t = np.deg2rad(theta_deg)
    m = np.cos(t)
    n = -np.sin(t)
    mn = m * n
    T = np.array(
        [
            [m * m, n * n, -2 * mn],
            [n * n, m * m, 2 * mn],
            [mn, -mn, m * m - n * n],
        ]
    )
    QT = T @ Q @ T.T
    return np.array([QT[0, 0], QT[0, 1], QT[0, 2], QT[1, 1], QT[1, 2], QT[2, 2]])


def q_to_abd_matrices(angles: np.ndarray, h: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the three 6x6 real matrices mapping a lamina Q-vector to laminate
    A/B/D vectors (Voigt order [11,12,16,22,26,66]).

    Equal-thickness plies spanning z in [-h/2, h/2]; A = sum Qbar_i dz,
    B = 1/2 sum Qbar_i d(z^2), D = 1/3 sum Qbar_i d(z^3) — matching the
    reference's symbolic construction (Material.py:690-741) evaluated at h.
    """
    angles = np.asarray(angles, dtype=np.float64)
    nl = angles.size
    zs = np.linspace(-h / 2.0, h / 2.0, nl + 1)
    dz1 = np.diff(zs)
    dz2 = np.diff(zs**2)
    dz3 = np.diff(zs**3)

    MA = np.zeros((6, 6))
    MB = np.zeros((6, 6))
    MD = np.zeros((6, 6))
    eye = np.eye(6)
    for k in range(6):
        for i in range(nl):
            qb = _qbar_components(eye[k], angles[i])
            MA[:, k] += qb * dz1[i]
            MB[:, k] += qb * dz2[i] / 2.0
            MD[:, k] += qb * dz3[i] / 3.0
    return MA, MB, MD


# ---------------------------------------------------------------------------
# Material base class
# ---------------------------------------------------------------------------

class Material(abc.ABC):
    """Interface class for all materials (reference Material.py:35-354).

    Attributes
    ----------
    density : float
        Material density in kg/m^3.
    is_mps : bool
        "Is midplane symmetric" — selects the pure-bending fast path when no
        accelerometer is attached (Problem selection logic).
    """

    density: float
    is_mps: bool

    def get_parameters(self) -> jax.Array | None:
        if self.has_params:
            return jnp.array(self._get_param_tuple())
        return None

    @abc.abstractmethod
    def _get_param_tuple(self) -> tuple:
        ...

    @property
    def has_params(self) -> bool:
        return None not in self._get_param_tuple()

    @abc.abstractmethod
    def get_ABD_transform(self, h: float) -> Callable:
        """f(theta, omega) -> (A, B, D) complex 6-vectors, order [11,12,16,22,26,66]."""

    @abc.abstractmethod
    def get_D_transform(self, h: float) -> Callable:
        """f(theta, omega) -> D complex 6-vector, order [11,12,16,22,26,66]."""

    # transform alias kept for reference API parity (used at Problem.py:568)
    def get_transform(self, h: float) -> Callable:
        return self.get_D_transform(h)

    @property
    def scalar_loss_factor(self) -> bool:
        """True when the complex moduli are (1 + i*beta) times a frequency-
        independent real vector — enables the exact modal solver fast path."""
        return True

    # ----- split (re, im) transforms ------------------------------------
    #
    # complex128 is not a TPU type, so an f64-grade engine cannot evaluate
    # the complex transforms on device in f64.  The split variants return
    # (re, im) pairs computed in REAL arithmetic at the params' own dtype:
    # f64 theta in -> f64-exact coefficients out.  (The f32/c64 coefficient
    # path was measured to floor FRF accuracy at ~5e-6 near resonance
    # peaks — the coefficients' f32 rounding is amplified by the resonance
    # Q-factor, independent of how tightly the linear systems are solved.)

    # position of beta in the parameter vector for (1 + i*beta)-structured
    # families; None disables the exact scalar-loss split path
    _loss_factor_index: int | None = None

    def _real_coeff_transform(self, h: float) -> Callable:
        """Real coefficient core for scalar-loss families: f(params, ...)
        -> (A, B, D) REAL 6-vectors with complex coefficients
        ``(1 + i*beta) * these``.  Overridden by the concrete families."""
        raise NotImplementedError

    def get_ABD_transform_split(self, h: float) -> Callable:
        """f(theta, omega) -> ((Are, Aim), (Bre, Bim), (Dre, Dim)), all real
        arrays in theta's dtype.  Exact at f64 for the built-in families;
        custom materials fall back to their complex transform evaluated at
        the platform precision (c64 on TPU — same accuracy as before)."""
        if self.scalar_loss_factor and self._loss_factor_index is not None:
            real_fn = self._real_coeff_transform(h)
            bi = self._loss_factor_index

            def _split(params, *args):
                A, B, D = real_fn(params, *args)
                b = params[bi]
                return (A, b * A), (B, b * B), (D, b * D)

            return _split

        from ..config import default_precision

        cf = self.get_ABD_transform(h)
        rdt = default_precision().real

        def _split_fallback(params, *args):
            # cast omega (and any extra args) to the platform real dtype
            # too: an f64 omega would promote intermediates — and any
            # `1j*...` term — to complex128, which is not a TPU dtype
            args = tuple(jnp.asarray(a).astype(rdt) for a in args)
            A, B, D = cf(jnp.asarray(params).astype(rdt), *args)
            return ((jnp.real(A), jnp.imag(A)), (jnp.real(B), jnp.imag(B)),
                    (jnp.real(D), jnp.imag(D)))

        return _split_fallback

    def get_D_transform_split(self, h: float) -> Callable:
        """f(theta, omega) -> (Dre, Dim) real arrays (see
        :meth:`get_ABD_transform_split`)."""
        if self.scalar_loss_factor and self._loss_factor_index is not None:
            real_fn = self._real_coeff_transform(h)
            bi = self._loss_factor_index

            def _split(params, *args):
                _, _, D = real_fn(params, *args)
                return D, params[bi] * D

            return _split

        from ..config import default_precision

        cf = self.get_D_transform(h)
        rdt = default_precision().real

        def _split_fallback(params, *args):
            args = tuple(jnp.asarray(a).astype(rdt) for a in args)
            D = cf(jnp.asarray(params).astype(rdt), *args)
            return jnp.real(D), jnp.imag(D)

        return _split_fallback

    # ----- constraints ----------------------------------------------------

    @staticmethod
    def _get_nonlin_constr(scaling_params=1.0):
        return None

    @staticmethod
    def _get_lin_constr(scaling_params=1.0):
        return None

    @classmethod
    def get_constraints(cls, scaling_params: np.ndarray | None = None):
        """Constraint set for scipy.optimize in the SCALED parameter space
        the optimizers work in (contract of reference Material.py:205-264:
        a single constraint object, a [linear, nonlinear] list, or None).

        Linear families ship a plain LinearConstraint matrix; families with
        a curved feasibility surface (e.g. the orthotropic
        ``sqrt(E1/E2) > nu12``) add a NonlinearConstraint whose jacobian
        and lagrangian hessian come from jax AD instead of scipy's
        finite differences.
        """
        import scipy.optimize

        scale = 1.0 if scaling_params is None else np.array(scaling_params)
        built = []
        lin = cls._get_lin_constr(scale)
        if lin is not None:
            A, lo, hi = lin
            built.append(scipy.optimize.LinearConstraint(A, lo, hi))
        nonlin = cls._get_nonlin_constr(scale)
        if nonlin is not None:
            g, lo, hi = nonlin
            built.append(scipy.optimize.NonlinearConstraint(
                g, lo, hi,
                jac=jax.jit(jax.jacobian(g)),
                # trust-constr wants hess(x, v) = d2/dx2 <v, g(x)>
                hess=jax.jit(jax.hessian(lambda x, v: jnp.dot(g(x), v))),
            ))
        if not built:
            return None
        return built[0] if len(built) == 1 else built

    @classmethod
    def check_parameters(cls, params: np.ndarray, scaling_params=1.0) -> bool:
        """True when the (scaled) parameter vector satisfies every family
        constraint (contract of reference Material.py:266-308)."""
        x = np.asarray(params)
        lin = cls._get_lin_constr(scaling_params)
        checks = [] if lin is None else [(lin[0] @ x, lin[1], lin[2])]
        nonlin = cls._get_nonlin_constr(scaling_params)
        if nonlin is not None:
            g, lo, hi = nonlin
            checks.append((np.asarray(g(x)), lo, hi))
        return all(bool(np.all((lo <= v) & (v <= hi))) for v, lo, hi in checks)

    # ----- persistence ----------------------------------------------------

    def get_save_dict(self) -> dict:
        d = {}
        for k, v in self.__dict__.items():
            if k.startswith("_"):
                continue
            if isinstance(v, np.ndarray):
                v = v.tolist()
            d[k] = v
        return d

    def __str__(self):
        s = f"{self.__class__.__name__} material with\n"
        for k, v in self.get_save_dict().items():
            s += f"{k} = {v}\n"
        return s.rstrip()

    def save_to_file(self, material_name: str) -> None:
        """Write ``materials/<name>.json`` (reference Material.py:331-354)."""
        folder = os.path.join(get_package_dir(), "materials")
        os.makedirs(folder, exist_ok=True)
        d = self.get_save_dict()
        d.setdefault("atype", _ATYPE_OF_CLASS[type(self).__name__])
        with open(os.path.join(folder, material_name + ".json"), "w") as file:
            json.dump(d, file, indent=4)


# ---------------------------------------------------------------------------
# Concrete materials
# ---------------------------------------------------------------------------

def _isotropic_D(params, _h):
    E, G, beta = params[0], params[1], params[2]
    nu = E / (2.0 * G) - 1.0
    D = E * _h**3 / (12.0 * (1.0 - nu**2))
    return jnp.array([D, nu * D, 0.0, D, 0.0, D * (1 - nu) / 2]) * (1 + 1j * beta)


class Isotropic(Material):
    """theta = [E, G, beta]; D = E h^3 / 12(1-nu^2), nu = E/2G - 1
    (reference Material.py:357-433)."""

    def __init__(self, density, E=None, G=None, beta=None):
        self.density = density
        self.is_mps = True
        self.E = E
        self.G = G
        self.beta = beta

    def _get_param_tuple(self):
        return (self.E, self.G, self.beta)

    _loss_factor_index = 2

    def _real_coeff_transform(self, h: float) -> Callable:
        def _real(params, *args, _h):
            # (2,)-vector chains: see _v2 (TPU f64 scalar-path caveat)
            E, G = _v2(params[0]), _v2(params[1])
            nu = E / (2.0 * G) - 1.0
            A = E * _h / (1.0 - nu * nu)
            D = A * (_h * _h / 12.0)
            nu0 = _s0(nu)
            one = jnp.ones_like(nu0)
            zero = jnp.zeros_like(nu0)
            arr = jnp.stack([one, nu0, zero, one, zero,
                             _s0((1.0 - nu) / 2.0)])
            return _s0(A) * arr, jnp.zeros_like(arr), _s0(D) * arr

        return Partial(_real, _h=h)

    def get_D_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            return _isotropic_D(params, _h)

        return Partial(_transform, _h=h)

    def get_ABD_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            E, G, beta = params[0], params[1], params[2]
            nu = E / (2.0 * G) - 1.0
            A = E * _h / (1 - nu**2)
            D = A * _h**2 / 12.0
            arr = jnp.array([1.0, nu, 0.0, 1.0, 0.0, (1 - nu) / 2]) * (1 + 1j * beta)
            return A * arr, jnp.zeros_like(arr), D * arr

        return Partial(_transform, _h=h)

    @staticmethod
    def _get_lin_constr(scaling_params=1.0):
        # E, G, beta > 0; 2G < E < 3G  (0 < nu < 0.5); Material.py:412-433
        A = np.eye(5, 3)
        A[3, 0] = 1.0
        A[4, 0] = -1.0
        A[3, 1] = -2.0
        A[4, 1] = 3.0
        if isinstance(scaling_params, float):
            A *= scaling_params
        else:
            A = A * np.asarray(scaling_params)[None, :]
        return A, 1e-12, np.inf


class Orthotropic(Material):
    """theta = [E1, E2, G12, nu12, beta] (reference Material.py:436-542).

    Deviation from the reference: Material.py:499 computes
    ``D22 = D11/E_ratio`` with ``E_ratio = E2/E1`` — i.e. D22 = D11*E1/E2,
    which contradicts classical lamination theory (D22/D11 = E2/E1) and the
    reference's own membrane branch (``A22 = E2/E1*A11``, Material.py:469).
    We implement the physically correct ``D22 = D11 * E2/E1``.
    """

    def __init__(self, density, E1=None, E2=None, G12=None, nu12=None, beta=None):
        self.density = density
        self.is_mps = True
        self.E1 = E1
        self.E2 = E2
        self.G12 = G12
        self.nu12 = nu12
        self.beta = beta

    def _get_param_tuple(self):
        return (self.E1, self.E2, self.G12, self.nu12, self.beta)

    _loss_factor_index = 4

    def _real_coeff_transform(self, h: float) -> Callable:
        def _real(params, *args, _h):
            # (2,)-vector chains: see _v2 (TPU f64 scalar-path caveat);
            # nu12's 0.25 companion keeps 1 - nu12*nu21 away from 0 in
            # the dummy lane
            E1, E2, G12 = (_v2(params[i]) for i in range(3))
            nu12 = _v2(params[3], 0.25)
            E_ratio = E2 / E1
            nu21 = E_ratio * nu12
            A11 = E1 * _h / (1.0 - nu12 * nu21)
            D11 = A11 * (_h * _h / 12.0)
            z = jnp.zeros_like(_s0(A11))
            As = jnp.stack([_s0(A11), _s0(nu21 * A11), z,
                            _s0(E_ratio * A11), z, _s0(G12 * _h)])
            Ds = jnp.stack([_s0(D11), _s0(nu21 * D11), z,
                            _s0(E_ratio * D11), z,
                            _s0(G12 * (_h ** 3 / 12.0))])
            return As, jnp.zeros_like(As), Ds

        return Partial(_real, _h=h)

    def get_D_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            E1, E2, G12, nu12, beta = (params[i] for i in range(5))
            E_ratio = E2 / E1
            nu21 = E_ratio * nu12
            D11 = E1 * _h**3 / (12 * (1 - nu12 * nu21))
            D66 = G12 * _h**3 / 12
            D12 = nu21 * D11
            D22 = D11 * E_ratio
            return jnp.array([D11, D12, 0.0, D22, 0.0, D66]) * (1 + 1j * beta)

        return Partial(_transform, _h=h)

    def get_ABD_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            E1, E2, G12, nu12, beta = (params[i] for i in range(5))
            E_ratio = E2 / E1
            nu21 = E_ratio * nu12
            A11 = E1 * _h / (1 - nu12 * nu21)
            A12 = nu21 * A11
            A22 = E_ratio * A11
            A66 = G12 * _h
            D11 = E1 * _h**3 / (12 * (1 - nu12 * nu21))
            D66 = G12 * _h**3 / 12
            D12 = nu21 * D11
            D22 = D11 * E_ratio
            As = jnp.array([A11, A12, 0.0, A22, 0.0, A66]) * (1 + 1j * beta)
            Ds = jnp.array([D11, D12, 0.0, D22, 0.0, D66]) * (1 + 1j * beta)
            return As, jnp.zeros_like(As), Ds

        return Partial(_transform, _h=h)

    @staticmethod
    def _get_nonlin_constr(scaling_params=1.0):
        # sqrt(E1/E2) > nu12  (Material.py:506-517)
        def constr_func(params):
            params = params * scaling_params
            return jnp.array([jnp.sqrt(params[0] / params[1]) - params[3]])

        return constr_func, 1e-12, np.inf

    @staticmethod
    def _get_lin_constr(scaling_params=1.0):
        # all 5 positive; E1 > E2; 1.05 E1 > G12  (Material.py:519-542)
        A = np.eye(7, 5)
        A[5, 0] = 1.0
        A[5, 1] = -1.0
        A[6, 0] = 1.05
        A[6, 2] = -1.0
        if isinstance(scaling_params, float):
            A *= scaling_params
        else:
            A = A * np.asarray(scaling_params)[None, :]
        return A, 1e-12, np.inf


class OrthotropicD4(Material):
    """Orthotropic with per-modulus loss factors,
    theta = [E1, E2, G12, nu12, b1, b2, b3, b4] (reference Material.py:545-636).

    Note: the reference's transforms close over the *outer* ``h`` instead of
    the bound ``_h`` (Material.py:592-594, 620-623) — works only by closure
    accident; we bind ``_h`` properly.
    """

    def __init__(self, density, E1=None, E2=None, G12=None, nu12=None,
                 b1=None, b2=None, b3=None, b4=None):
        self.density = density
        self.is_mps = True
        self.E1 = E1
        self.E2 = E2
        self.G12 = G12
        self.nu12 = nu12
        self.b1 = b1
        self.b2 = b2
        self.b3 = b3
        self.b4 = b4

    def _get_param_tuple(self):
        return (self.E1, self.E2, self.G12, self.nu12,
                self.b1, self.b2, self.b3, self.b4)

    @property
    def scalar_loss_factor(self) -> bool:
        # Per-modulus losses are NOT a single (1+i*beta) scaling -> the modal
        # resolvent fast path is inexact; the direct solver engine is used.
        return False

    @staticmethod
    def _complex_moduli(params):
        E1 = params[0] * (1 + 1j * params[4])
        E2 = params[1] * (1 + 1j * params[5])
        G12 = params[2] * (1 + 1j * params[6])
        nu12 = params[3] * (1 + 1j * params[7])
        return E1, E2, G12, nu12

    def get_D_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            E1, E2, G12, nu12 = OrthotropicD4._complex_moduli(params)
            E_ratio = E2 / E1
            nu21 = E_ratio * nu12
            D11 = E1 * _h**3 / (12 * (1 - nu12 * nu21))
            D66 = G12 * _h**3 / 12
            D12 = nu21 * D11
            D22 = D11 * E_ratio
            return jnp.array([D11, D12, 0.0, D22, 0.0, D66])

        return Partial(_transform, _h=h)

    def get_ABD_transform(self, h: float) -> Callable:
        def _transform(params, *args, _h):
            E1, E2, G12, nu12 = OrthotropicD4._complex_moduli(params)
            E_ratio = E2 / E1
            nu21 = E_ratio * nu12
            A11 = E1 * _h / (1 - nu12 * nu21)
            A12 = nu21 * A11
            A22 = E_ratio * A11
            A66 = G12 * _h
            D11 = E1 * _h**3 / (12 * (1 - nu12 * nu21))
            D66 = G12 * _h**3 / 12
            D12 = nu21 * D11
            D22 = D11 * E_ratio
            As = jnp.array([A11, A12, 0.0, A22, 0.0, A66])
            Ds = jnp.array([D11, D12, 0.0, D22, 0.0, D66])
            return As, jnp.zeros_like(As), Ds

        return Partial(_transform, _h=h)

    @staticmethod
    def _split_coeff_rows(params, _h):
        """The D4 coefficient algebra in split (re, im) pair arithmetic —
        complex128 is not a TPU type, so the exact-f64 evaluation runs on
        real pairs.  Each component is a (2,)-vector chain (see _v2, the
        TPU f64 scalar-path caveat); lane-1 companions (1, 1) make
        ``|den|^2 = 5`` in the dummy lane, keeping it finite."""
        p = [_v2(params[i]) for i in range(8)]
        E1 = (p[0], p[0] * p[4])
        E2 = (p[1], p[1] * p[5])
        G12 = (p[2], p[2] * p[6])
        nu12 = (p[3], p[3] * p[7])
        E_ratio = _pair_div(E2, E1)
        nu21 = _pair_mul(E_ratio, nu12)
        nn = _pair_mul(nu12, nu21)
        den = (1.0 - nn[0], -nn[1])
        A11 = _pair_div((E1[0] * _h, E1[1] * _h), den)
        A12 = _pair_mul(nu21, A11)
        A22 = _pair_mul(E_ratio, A11)
        A66 = (G12[0] * _h, G12[1] * _h)
        hd = _h**2 / 12.0
        D11 = (A11[0] * hd, A11[1] * hd)
        D12 = _pair_mul(nu21, D11)
        D22 = _pair_mul(E_ratio, D11)
        D66 = (G12[0] * _h**3 / 12.0, G12[1] * _h**3 / 12.0)
        z = jnp.zeros_like(_s0(A11[0]))

        def rows(c11, c12, c22, c66):
            return (jnp.stack([_s0(c11[0]), _s0(c12[0]), z, _s0(c22[0]),
                               z, _s0(c66[0])]),
                    jnp.stack([_s0(c11[1]), _s0(c12[1]), z, _s0(c22[1]),
                               z, _s0(c66[1])]))

        return rows(A11, A12, A22, A66), rows(D11, D12, D22, D66)

    def get_ABD_transform_split(self, h: float) -> Callable:
        def _split(params, *args, _h):
            (Are, Aim), (Dre, Dim) = OrthotropicD4._split_coeff_rows(
                params, _h)
            zB = jnp.zeros_like(Are)
            return (Are, Aim), (zB, zB), (Dre, Dim)

        return Partial(_split, _h=h)

    def get_D_transform_split(self, h: float) -> Callable:
        def _split(params, *args, _h):
            _, (Dre, Dim) = OrthotropicD4._split_coeff_rows(params, _h)
            return Dre, Dim

        return Partial(_split, _h=h)


class SOL(Orthotropic):
    """Simple Orthotropic Laminate: identical unidirectional plies at given
    angles (reference Material.py:639-788).  The Q->(A,B,D) linear maps are
    closed-form numpy (see ``q_to_abd_matrices``), not sympy."""

    def __init__(self, density, angles, E1=None, E2=None, G12=None, nu12=None, beta=None):
        super().__init__(density, E1, E2, G12, nu12, beta)
        self.angles = np.array(angles, dtype=np.float64)
        # mid-plane symmetry <=> the angle stack is a palindrome
        # (Material.py:652-653)
        if np.sum(np.abs(self.angles - self.angles[::-1])) > 1e-6:
            self.is_mps = False

    @staticmethod
    def _q_vector(params):
        # (2,)-vector chains: see _v2 (TPU f64 scalar-path caveat)
        E1, E2, G12 = _v2(params[0]), _v2(params[1]), _v2(params[2])
        nu12 = _v2(params[3], 0.25)
        den = 1.0 - (E2 / E1) * (nu12 * nu12)
        z = jnp.zeros_like(_s0(den))
        return jnp.stack([_s0(E1 / den), _s0(nu12 * E2 / den), z,
                          _s0(E2 / den), z, _s0(G12)])

    def _real_coeff_transform(self, h: float) -> Callable:
        MA, MB, MD = q_to_abd_matrices(self.angles, h)

        def _real(params, *args, _MA, _MB, _MD):
            Q = SOL._q_vector(params)
            return _MA @ Q, _MB @ Q, _MD @ Q

        return Partial(_real, _MA=jnp.asarray(MA), _MB=jnp.asarray(MB),
                       _MD=jnp.asarray(MD))

    def get_ABD_transform(self, h: float) -> Callable:
        MA, MB, MD = q_to_abd_matrices(self.angles, h)

        def _transform(params, *args, _MA, _MB, _MD):
            beta = params[4]
            Q = SOL._q_vector(params)
            f = 1 + 1j * beta
            return (_MA @ Q) * f, (_MB @ Q) * f, (_MD @ Q) * f

        return Partial(_transform, _MA=jnp.asarray(MA), _MB=jnp.asarray(MB),
                       _MD=jnp.asarray(MD))

    def get_D_transform(self, h: float) -> Callable:
        if not self.is_mps:
            raise NotImplementedError(
                "Transform without A_ij and B_ij matrices for non "
                "midplane-symmetric composites."
            )
        _, _, MD = q_to_abd_matrices(self.angles, h)

        def _transform(params, *args, _MD):
            beta = params[4]
            Q = SOL._q_vector(params)
            return (_MD @ Q) * (1 + 1j * beta)

        return Partial(_transform, _MD=jnp.asarray(MD))

    def get_save_dict(self):
        d = super().get_save_dict()
        d["angles"] = list(np.asarray(self.angles))
        return d


class SymmetricalSOL(SOL):
    """SOL with E1 == E2 tied, theta = [E1, G12, nu12, beta]
    (reference Material.py:791-885)."""

    def __init__(self, density, angles, E1=None, G12=None, nu12=None, beta=None):
        super().__init__(density, angles, E1, E1, G12, nu12, beta)

    @property
    def E2(self):
        return self.E1

    @E2.setter
    def E2(self, val):
        self.E1 = val

    def _get_param_tuple(self):
        return (self.E1, self.G12, self.nu12, self.beta)

    @staticmethod
    def _q_vector4(params):
        # (2,)-vector chains: see _v2 (TPU f64 scalar-path caveat)
        E1 = _v2(params[0])
        E2 = E1
        G12 = _v2(params[1])
        nu12 = _v2(params[2], 0.25)
        den = 1.0 - (E2 / E1) * (nu12 * nu12)
        z = jnp.zeros_like(_s0(den))
        return jnp.stack([_s0(E1 / den), _s0(nu12 * E2 / den), z,
                          _s0(E2 / den), z, _s0(G12)])

    _loss_factor_index = 3

    def _real_coeff_transform(self, h: float) -> Callable:
        MA, MB, MD = q_to_abd_matrices(self.angles, h)

        def _real(params, *args, _MA, _MB, _MD):
            Q = SymmetricalSOL._q_vector4(params)
            return _MA @ Q, _MB @ Q, _MD @ Q

        return Partial(_real, _MA=jnp.asarray(MA), _MB=jnp.asarray(MB),
                       _MD=jnp.asarray(MD))

    def get_ABD_transform(self, h: float) -> Callable:
        MA, MB, MD = q_to_abd_matrices(self.angles, h)

        def _transform(params, *args, _MA, _MB, _MD):
            beta = params[3]
            Q = SymmetricalSOL._q_vector4(params)
            f = 1 + 1j * beta
            return (_MA @ Q) * f, (_MB @ Q) * f, (_MD @ Q) * f

        return Partial(_transform, _MA=jnp.asarray(MA), _MB=jnp.asarray(MB),
                       _MD=jnp.asarray(MD))

    def get_D_transform(self, h: float) -> Callable:
        if not self.is_mps:
            raise NotImplementedError(
                "Transform without A_ij and B_ij matrices for non "
                "midplane-symmetric composites."
            )
        _, _, MD = q_to_abd_matrices(self.angles, h)

        def _transform(params, *args, _MD):
            beta = params[3]
            Q = SymmetricalSOL._q_vector4(params)
            return (_MD @ Q) * (1 + 1j * beta)

        return Partial(_transform, _MD=jnp.asarray(MD))

    @staticmethod
    def _get_nonlin_constr(scaling_params=1.0):
        return None

    @staticmethod
    def _get_lin_constr(scaling_params=1.0):
        # E1, G12, beta > 0; 0 < nu12 < 1; E1 > G12  (Material.py:863-885)
        A = np.eye(5, 4)
        A[4, 0] = 1.0
        A[4, 1] = -1.0
        if isinstance(scaling_params, float):
            A *= scaling_params
        else:
            A = A * np.asarray(scaling_params)[None, :]
        eps = 1e-12
        lb = np.full(5, eps)
        ub = np.full(5, np.inf)
        ub[2] = 1.0 - eps
        return A, lb, ub


_ATYPE_OF_CLASS = {
    "Isotropic": "isotropic",
    "Orthotropic": "orthotropic",
    "OrthotropicD4": "orthotropic_d4",
    "SOL": "sol",
    "SymmetricalSOL": "symm_sol",
}


# ---------------------------------------------------------------------------
# Factory (reference Material.py:888-994)
# ---------------------------------------------------------------------------

def get_material(main_arg: str | float | int | dict, atype: str | None = None,
                 **kwargs) -> Material:
    """Create a Material from a name / density+kwargs / dict / .json path."""
    params = None

    if isinstance(main_arg, str):
        fname, ext = os.path.splitext(main_arg)
        if ext == ".json":
            fpath = os.path.abspath(main_arg)
        elif ext == "":
            fpath = os.path.join(get_package_dir(), "materials", main_arg + ".json")
        else:
            raise ValueError(
                f"Unsupported extension for material properties file: `{ext}`."
            )

        if os.path.exists(fpath):
            with open(fpath, "r") as file:
                params_json = json.load(file)
            try:
                params = {
                    k: v for k, v in params_json.items()
                    if k not in ("density", "atype", "is_mps")
                }
                density = params_json["density"]
                atype = params_json["atype"]
            except KeyError as err:
                raise RuntimeError(
                    f"Required parameter {err.args[0]} was not provided by the "
                    f".json file {fpath}."
                )
        else:
            raise ValueError(
                f"Could not find file {main_arg} or such material in "
                "`materials` folder."
            )

    elif isinstance(main_arg, (float, int)):
        density = float(main_arg)
        if not isinstance(atype, str):
            raise ValueError("Atype argument was not provided.")
        params = kwargs

    elif isinstance(main_arg, dict):
        try:
            density = main_arg["density"]
            atype = main_arg["atype"]
            params = {
                k: v for k, v in main_arg.items()
                if k not in ("density", "atype", "is_mps")
            }
        except KeyError as err:
            raise RuntimeError(
                f"Required parameter {err.args[0]} was not provided in "
                "dictionary, cannot create Material."
            )
    else:
        raise TypeError("Argument `main_arg` should have type `str`, number or `dict`.")

    if density <= 0:
        raise ValueError(
            f"Cannot create Material with negative material density: {density}."
        )

    if atype not in ATYPES:
        raise ValueError(
            f"Invalid anisotropy type {atype} for material. "
            f"Supported options are: {list(ATYPES.keys())}."
        )

    if atype in ("sol", "symm_sol") and "angles" not in params:
        raise ValueError(
            "Cannot create simple orthotropic laminate material without "
            "`angles` tuple."
        )

    if not set(params.keys()).issubset(ATYPES[atype]):
        raise ValueError(
            "Mismatching anisotropy type and provided arguments: expected "
            f"values of {ATYPES[atype]}, got {params.keys()}."
        )

    cls = {
        "isotropic": Isotropic,
        "orthotropic": Orthotropic,
        "orthotropic_d4": OrthotropicD4,
        "sol": SOL,
        "symm_sol": SymmetricalSOL,
    }[atype]
    return cls(density, **params)
