"""Compiled local optimizers: the whole iteration runs on the device.

The reference drives its optimizers from host Python, one jitted point
evaluation per step (source/jax_plate/Optimizers.py).  Here each optimizer
lowers its *entire* run — objective, derivatives, acceptance logic, iterate
histories — into a single ``lax.scan``, so an N-step run is one trace, one
XLA executable and one dispatch.  Early termination is expressed as a
freeze: once a terminal condition fires, the remaining scan steps carry the
state through unchanged and the host slices the histories afterwards.

The trust-region subproblem is solved on-device by a safeguarded Newton
iteration on the secular equation (Moré–Sorensen): an eigendecomposition of
the tiny model Hessian turns ``||p(lam)|| = delta`` into a scalar root-find
with analytic derivative, with an explicit hard-case branch.  This replaces
the host-side lambda doubling + bisection of the reference and is exact for
interior, boundary and negative-curvature steps alike.

Objectives come in two flavours:

* plain traceable callables ``f(x) -> scalar`` (analytic tests, user code);
* framework losses (``Problem.getLossFunction``) exposing ``.pure()`` →
  ``(fn, aux)`` with ``fn(x, *aux)`` traceable and ``aux`` the operator
  pytree.  Threading ``aux`` through the optimizer jit keeps the FEM arrays
  runtime arguments — never HLO constants (see ``Problem.getFRCore``).

Public surface (matches the reference's Optimizers.py): ``optResult``,
``FixedParameterFunction``, ``optimize_trust_region``, ``optimize_gd``,
``optimize_cd``, ``optimize_cd_mem``, ``optimize_cd_mem2``,
``solve_trust_region_model``, ``get_model_newt``.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


optResult = namedtuple(
    "optResult",
    ["x", "f", "f_history", "x_history", "grad_history", "niter", "status"],
)

# terminal codes carried through the compiled loops
_RUNNING, _CONVERGED, _STALLED, _MODEL_FAIL = 0, 1, 2, 3
_STATUS = {
    _RUNNING: "Running",
    _CONVERGED: "Converged",
    _STALLED: "Stalled",
    _MODEL_FAIL: "Trust-region model solve produced an invalid step",
}


class FixedParameterFunction:
    """View of an objective with a subset of coordinates pinned.

    ``FixedParameterFunction(f, n, idx, vals)`` behaves as
    ``g(y) = f(embed(y))`` where ``embed`` scatters the free coordinates
    ``y`` into an n-vector holding ``vals`` at ``idx``.  Traceable, so it
    composes with the compiled optimizers and with jax transforms.
    """

    def __init__(self, function: Callable, param_size: int,
                 fixed_indices, fixed_values):
        self.func = function
        pinned_idx = np.atleast_1d(np.asarray(fixed_indices, dtype=np.int64))
        pinned_val = np.atleast_1d(np.asarray(fixed_values, dtype=np.float64))
        if pinned_idx.shape != pinned_val.shape:
            raise ValueError(
                f"{pinned_idx.size} pinned indices vs {pinned_val.size} values"
            )
        template = np.zeros(param_size)
        template[pinned_idx] = pinned_val
        free = np.setdiff1d(np.arange(param_size), pinned_idx)
        self.array = template
        self.free_idx = jnp.asarray(free)
        self._template = jnp.asarray(template)

    def __call__(self, params, *args):
        full = self._template.at[self.free_idx].set(params)
        return self.func(full, *args)


def _objective(f):
    """Resolve an objective to ``(fn, aux)`` with ``fn(x, *aux)`` traceable.

    Framework losses publish ``.pure()``; anything else is assumed to be a
    traceable callable (closing over device arrays large enough to matter
    would be a caller bug — see module docstring).
    """
    if hasattr(f, "pure"):
        return f.pure()
    return (lambda x, *_: f(x)), ()


def _compiled(host, key, build):
    """Memoize a jitted driver on the objective object when it allows
    attribute writes (repeat solveInverse calls skip retracing); fall back
    to a fresh jit otherwise."""
    memo = getattr(host, "_driver_memo", None)
    if memo is None:
        try:
            memo = {}
            setattr(host, "_driver_memo", memo)
        except Exception:
            return build()
    if key not in memo:
        memo[key] = build()
    return memo[key]


def _finish(x_fin, xs, fs, gs, codes, outer_of):
    """Slice stacked scan histories at the first terminal entry and package
    the reference-shaped result record.

    ``codes[t]``: terminal code raised at entry t (0 while running).  A
    ``_MODEL_FAIL`` entry is excluded from the histories (the failing step
    never produced a valid iterate); other terminal entries are included.
    ``outer_of(t)`` maps a history index to the reported iteration count
    (identity for per-step optimizers, ``t // n`` for coordinate cycles).
    """
    codes = np.asarray(codes)
    fs = np.asarray(fs)
    xs = np.asarray(xs)
    gs = np.asarray(gs)
    hit = np.flatnonzero(codes != _RUNNING)
    if hit.size:
        t = int(hit[0])
        code = int(codes[t])
        last = t - 1 if code == _MODEL_FAIL else t
    else:
        t = codes.shape[0] - 1
        code = _RUNNING
        last = t
    f_hist = [fs[i] for i in range(last + 1)]
    x_hist = [xs[i] for i in range(last + 1)]
    g_hist = [gs[i] for i in range(last + 1)]
    f_fin = fs[last] if last >= 0 else None
    return optResult(
        x_fin, f_fin, f_hist, x_hist, g_hist, outer_of(t), _STATUS[code]
    )


# ---------------------------------------------------------------------------
# trust region
# ---------------------------------------------------------------------------

def solve_trust_region_model(B, g, delta, rtol=1e-6, max_iter=100):
    """Minimize ``g.p + p.B.p/2`` subject to ``||p|| <= delta``.

    Spectral Moré–Sorensen: with ``B = Q diag(w) Q^T`` and ``c = Q^T g``,
    the constrained minimizer is ``p(lam) = -Q ((w+lam)^-1 c)`` for the
    unique ``lam >= max(0, -w_min)`` with ``||p(lam)|| = delta`` (or
    ``lam = 0`` when the Newton point is interior).  The root is found by a
    safeguarded Newton iteration on the secular function
    ``1/||p(lam)|| - 1/delta`` — smooth, monotone, quadratically convergent.
    The hard case (gradient orthogonal to the most-negative eigendirection)
    is completed with an explicit eigenvector component.

    Fully traceable; returns ``(p, lam, predicted_decrease)``.
    """
    B = jnp.asarray(B)
    g = jnp.asarray(g)
    dt = jnp.result_type(B.dtype, g.dtype, jnp.float32)
    B = B.astype(dt)
    g = g.astype(dt)
    eps = jnp.finfo(dt).eps
    w, Q = jnp.linalg.eigh(0.5 * (B + B.T))
    c = Q.T @ g
    w_min = w[0]
    scale = jnp.maximum(jnp.max(jnp.abs(w)), 1.0)
    tiny = eps * scale

    # interior Newton point: valid iff B is PD and the step fits the radius
    d_int = jnp.where(jnp.abs(w) < tiny, tiny, w)
    p_int = -c / d_int
    interior = (w_min > tiny) & (jnp.linalg.norm(p_int) <= delta)

    # boundary root: lam in (lam_floor, ||c||/delta - w_min]
    lam_floor = jnp.maximum(-w_min, 0.0)
    lam_cap = jnp.maximum(jnp.linalg.norm(c) / jnp.maximum(delta, tiny) - w_min,
                          lam_floor + scale)

    def secular_step(state, _):
        lam, lo, hi = state
        d = jnp.maximum(w + lam, tiny)
        y = c / d
        nrm = jnp.maximum(jnp.linalg.norm(y), jnp.finfo(dt).tiny)
        phi = 1.0 / nrm - 1.0 / delta
        dphi = jnp.sum(y * y / d) / nrm**3
        lo = jnp.where(nrm > delta, jnp.maximum(lo, lam), lo)
        hi = jnp.where(nrm <= delta, jnp.minimum(hi, lam), hi)
        prop = lam - phi / jnp.maximum(dphi, jnp.finfo(dt).tiny)
        lam = jnp.where((prop > lo) & (prop < hi), prop, 0.5 * (lo + hi))
        return (lam, lo, hi), None

    lam0 = lam_floor + 0.5 * (lam_cap - lam_floor)
    (lam_b, _, _), _ = lax.scan(
        secular_step, (lam0, lam_floor, lam_cap), None,
        length=int(max_iter) if max_iter else 40,
    )

    lam = jnp.where(interior, 0.0, jnp.maximum(lam_b, lam_floor + tiny))
    d = jnp.where(interior, d_int, jnp.maximum(w + lam, tiny))
    y = -c / d

    # hard case: the boundary iteration bottomed out at lam ~ -w_min with
    # ||p|| still short of the radius; fill the gap along the bottom
    # eigenvector (any sign attains the same model value)
    gap2 = jnp.maximum(delta**2 - jnp.sum(y * y), 0.0)
    hard = (~interior) & (jnp.linalg.norm(y) < delta * (1.0 - 10 * rtol))
    y = y.at[0].add(jnp.where(hard, jnp.sqrt(gap2), 0.0))

    # never overshoot the radius (finite secular iterations leave slack)
    nrm = jnp.linalg.norm(y)
    y = jnp.where(nrm > delta, y * (delta / jnp.maximum(nrm, tiny)), y)

    p = Q @ y
    decrease = -(jnp.dot(c, y) + 0.5 * jnp.sum(w * y * y))
    return p, lam, decrease


def get_model_newt(f):
    """Quadratic-model oracle ``x -> (f, grad, dense Hessian)``.

    Prefers a pre-compiled ``value_grad_hessian`` when the objective carries
    one; otherwise derives it (forward-over-reverse Hessian)."""
    if hasattr(f, "value_grad_hessian"):
        return f.value_grad_hessian

    vg = jax.jit(jax.value_and_grad(f))
    hess = jax.jit(jax.jacfwd(jax.grad(f)))

    def oracle(x):
        v, g = vg(x)
        return v, g, hess(x)

    return oracle


def optimize_trust_region(f, x_0, N_steps=10, delta_max=1.0, delta=None,
                          eta=0.15, method="newt", steps_to_stall=10):
    """Trust-region Newton, compiled end to end.

    Radius policy: quarter the radius when the model over-promises
    (``rho < 1/4``), double it (capped) after a radius-limited accurate step
    (``rho >= 3/4`` on the boundary); accept iterates with ``rho >= eta``.
    Rejected steps reuse the cached model — the expensive Hessian oracle
    only runs after an accepted move.
    """
    if delta is None:
        delta = delta_max / 10.0
    if not 0.0 <= eta <= 0.25:
        raise ValueError(f"eta must lie in [0, 0.25]; got {eta}")
    if method != "newt":
        raise NotImplementedError(f"Method <<{method}>> not implemented")

    fn, aux = _objective(f)
    x0 = jnp.asarray(x_0)
    n = x0.shape[0]
    dt = x0.dtype

    def build():
        def model(x, *aux):
            v, g = jax.value_and_grad(fn)(x, *aux)
            return v, g, jax.jacfwd(jax.grad(fn))(x, *aux)

        def driver(x0, delta0, delta_cap, eta_, stall_lim, *aux):
            def live(state):
                x, v, g, H, rad, want_model, stall, code = state
                v, g, H = lax.cond(
                    want_model,
                    lambda: model(x, *aux),
                    lambda: (v, g, H),
                )
                p, lam, pred = solve_trust_region_model(H, g, rad)
                ok = jnp.isfinite(pred) & (pred >= 0) & jnp.all(jnp.isfinite(p))

                v_trial = fn(x + p, *aux)
                rho = (v - v_trial) / jnp.maximum(pred, jnp.finfo(dt).tiny)
                rad = jnp.where(
                    rho < 0.25, 0.25 * rad,
                    jnp.where((rho >= 0.75) & (lam > 0),
                              jnp.minimum(2.0 * rad, delta_cap), rad),
                )
                accept = ok & (rho >= eta_)
                x = jnp.where(accept, x + p, x)
                stall = jnp.where(accept, 0, stall + 1)
                code = jnp.where(
                    ~ok, _MODEL_FAIL,
                    jnp.where(v < 1e-16, _CONVERGED,
                              jnp.where(stall >= stall_lim, _STALLED,
                                        _RUNNING)),
                ).astype(jnp.int32)
                return (x, v, g, H, rad, accept, stall, code), (x, v, g, code)

            def frozen(state):
                x, v, g, *_ = state
                return state, (x, v, g, jnp.int32(_RUNNING))

            def step(state, _):
                return lax.cond(state[-1] == _RUNNING, live, frozen, state)

            state0 = (
                x0, jnp.zeros((), dt), jnp.zeros(n, dt), jnp.zeros((n, n), dt),
                delta0, jnp.bool_(True), jnp.int32(0), jnp.int32(_RUNNING),
            )
            (x_fin, v_fin, *_), ys = lax.scan(step, state0, None,
                                              length=N_steps)
            return x_fin, ys

        return jax.jit(driver)

    run = _compiled(f, ("tr", N_steps, n, str(dt)), build)
    x_fin, (xs, vs, gs, codes) = run(
        x0, jnp.asarray(delta, dt), jnp.asarray(delta_max, dt),
        jnp.asarray(eta, dt), jnp.int32(steps_to_stall), *aux,
    )
    return _finish(x_fin, xs, vs, gs, codes, lambda t: t)


# ---------------------------------------------------------------------------
# first-order methods
# ---------------------------------------------------------------------------

def optimize_gd(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Fixed-step gradient descent as one compiled scan."""
    fn, aux = _objective(f)
    x0 = jnp.asarray(x_0)
    dt = x0.dtype

    def build():
        def driver(x0, h_, f_lo, *aux):
            vg = jax.value_and_grad(fn)

            def step(state, _):
                x, code = state
                v, g = vg(x, *aux)
                rec = (x, v, g)
                code = jnp.where(
                    (code == _RUNNING) & (v <= f_lo), _CONVERGED, code
                ).astype(jnp.int32)
                x_new = jnp.where(code == _RUNNING, x - h_ * g, x)
                return (x_new, code), rec + (code,)

            (x_fin, _), ys = lax.scan(step, (x0, jnp.int32(_RUNNING)),
                                      None, length=N_steps)
            return x_fin, ys

        return jax.jit(driver)

    run = _compiled(f, ("gd", N_steps, x0.shape, str(dt)), build)
    x_fin, (xs, vs, gs, codes) = run(
        x0, jnp.asarray(h, dt), jnp.asarray(f_min, dt), *aux
    )
    return _finish(x_fin, xs, vs, gs, codes, lambda t: t)


def _cd_driver_factory(fn, n, N_steps, adaptive):
    """Shared compiled loop for the coordinate-descent family.

    One scan entry per coordinate visit (``N_steps`` full cycles of ``n``
    coordinates).  ``adaptive`` adds a per-coordinate step-size register
    with a single shrink-and-retry backtrack per visit (factor 5), the
    cd_mem2 policy."""

    def driver(x0, steps0, f_lo, *aux):
        vg = jax.value_and_grad(fn)
        eye = jnp.eye(n, dtype=x0.dtype)

        def visit(state, t):
            x, steps, code = state
            i = t % n
            v, g = vg(x, *aux)
            g_i = eye[i] * g[i]
            rec = (x, v, g_i)
            code = jnp.where(
                (code == _RUNNING) & (v <= f_lo), _CONVERGED, code
            ).astype(jnp.int32)
            live = code == _RUNNING

            if adaptive:
                trial = x - steps[i] * g_i
                worse = fn(trial, *aux) > v
                s_i = jnp.where(worse, steps[i] / 5.0, steps[i])
                steps = steps.at[i].set(jnp.where(live, s_i, steps[i]))
                x = jnp.where(live, x - s_i * g_i, x)
            else:
                x = jnp.where(live, x - steps[i] * g_i, x)
            return (x, steps, code), rec + (code,)

        (x_fin, _, _), ys = lax.scan(
            visit, (x0, steps0, jnp.int32(_RUNNING)),
            jnp.arange(N_steps * n, dtype=jnp.int32),
        )
        return x_fin, ys

    return jax.jit(driver)


def _run_cd(f, x_0, N_steps, h, f_min, adaptive, tag):
    fn, aux = _objective(f)
    x0 = jnp.asarray(x_0)
    n = x0.shape[0]
    if n < 2:
        raise ValueError("coordinate descent needs at least 2 parameters")
    dt = x0.dtype
    run = _compiled(
        f, (tag, N_steps, n, str(dt)),
        lambda: _cd_driver_factory(fn, n, N_steps, adaptive),
    )
    x_fin, (xs, vs, gs, codes) = run(
        x0, jnp.full(n, h, dt), jnp.asarray(f_min, dt), *aux
    )
    return _finish(x_fin, xs, vs, gs, codes, lambda t: t // n)


def optimize_cd(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Cyclic coordinate descent (single-coordinate gradient steps)."""
    return _run_cd(f, x_0, N_steps, h, f_min, adaptive=False, tag="cd")


def optimize_cd_mem(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Reference-parity alias of :func:`optimize_cd`.

    The reference's `_mem` variant re-derives each coordinate's gradient
    through a pinned-parameter wrapper to shrink autodiff memory
    (Optimizers.py:290-323); under a compiled scan the full gradient is a
    single fused pass, so the restriction buys nothing here and the
    coordinate updates are mathematically identical."""
    return _run_cd(f, x_0, N_steps, h, f_min, adaptive=False, tag="cd")


def optimize_cd_mem2(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Coordinate descent with per-coordinate adaptive steps: a visit whose
    update raises the objective retries once from the same iterate with
    that coordinate's step shrunk 5x (kept shrunk for later cycles)."""
    return _run_cd(f, x_0, N_steps, h, f_min, adaptive=True, tag="cd2")
