"""Additional device-first optimizers beyond the reference set.

The BASELINE north star asks for Gauss-Newton iteration timing; the reference
only ships TR-Newton/GD/CD (Optimizers.py).  Here:

* ``optimize_newton`` — damped Newton with jit'd value/grad/Hessian and an
  Armijo backtracking line search.
* ``optimize_lbfgs`` — L-BFGS via optax's implementation, wrapped to return
  the same ``optResult`` record.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .local import optResult, get_model_newt


def optimize_newton(f, x_0, N_steps=20, damping=1e-8, f_min=1e-16,
                    backtrack=0.5, max_backtracks=20):
    """Damped Newton with Armijo backtracking."""
    update_model = get_model_newt(f)
    f_jit = f if hasattr(f, "value_and_grad") else jax.jit(f)

    x = jnp.asarray(x_0)
    x_history, f_history, grad_history = [], [], []
    status = "Running"
    cur_f = None
    k = 0

    for k in range(N_steps):
        cur_f, g, B = update_model(x)
        x_history.append(x)
        f_history.append(cur_f)
        grad_history.append(g)
        if cur_f <= f_min:
            status = "Converged"
            break

        g_h = np.asarray(g)
        B_h = np.asarray(B)
        lam = damping * np.trace(B_h) / B_h.shape[0]
        B_d = B_h + np.eye(B_h.shape[0], dtype=B_h.dtype) * lam
        try:
            step = np.linalg.solve(B_d, -g_h)
        except Exception:
            step = -g_h

        # fall back to steepest descent if the Newton step is not a descent dir
        if np.dot(step, g_h) > 0:
            step = -g_h
        step = jnp.asarray(step, dtype=x.dtype)

        t = 1.0
        accepted = False
        for _ in range(max_backtracks):
            new_f = f_jit(x + t * step)
            if new_f < cur_f:
                x = x + t * step
                accepted = True
                break
            t *= backtrack
        if not accepted:
            status = "Stalled"
            break

    return optResult(x, cur_f, f_history, x_history, grad_history, k, status)


class JointResidual:
    """Concatenation of several residual functions over one parameter vector.

    The remedy for weakly-identified anisotropic inversions: combine FRF
    datasets from multiple geometries / cuts of the same material (e.g. 0-
    and 90-degree strips) into one Gauss-Newton problem.  Each element is a
    ``Problem.getResidualFunction`` object (or any callable with the same
    duck-typed interface); optional per-dataset weights.
    """

    def __init__(self, residuals, weights=None):
        self._rs = list(residuals)
        if weights is None:
            weights = [1.0] * len(self._rs)
        self._ws = [float(w) for w in weights]

    def __call__(self, params):
        parts = [w * r(params) for r, w in zip(self._rs, self._ws)]
        return jnp.concatenate(parts)

    def value_and_jac(self, params):
        vals, jacs = [], []
        for r, w in zip(self._rs, self._ws):
            if hasattr(r, "value_and_jac"):
                v, J = r.value_and_jac(params)
            else:
                v = r(params)
                J = jax.jacfwd(r)(params)
            vals.append(w * v)
            jacs.append(w * J)
        return jnp.concatenate(vals), jnp.concatenate(jacs, axis=0)


def optimize_gauss_newton(resfn, x_0, N_steps=20, lm_damping=1e-3,
                          f_min=1e-16, backtrack=0.5, max_backtracks=15):
    """Gauss-Newton / Levenberg-Marquardt on a vector residual.

    ``resfn`` is a ``Problem.getResidualFunction`` object (pre-jitted
    value_and_jac via forward-mode JVPs through the sweep) or any callable
    with the same duck-typed interface.  The normal-equations solve is a tiny
    host-side dense problem.  Returns the usual optResult record with
    f = mean squared residual.
    """
    if hasattr(resfn, "value_and_jac"):
        value_and_jac = resfn.value_and_jac
    else:
        def value_and_jac(x):
            return resfn(x), jax.jacfwd(resfn)(x)

    x = jnp.asarray(x_0)
    x_history, f_history, grad_history = [], [], []
    status = "Running"
    lam = lm_damping
    cur_f = None
    k = 0

    for k in range(N_steps):
        r, J = value_and_jac(x)
        r_h = np.asarray(r)
        J_h = np.asarray(J)
        m = r_h.size
        cur_f = float(r_h @ r_h) / m
        g = 2.0 * (J_h.T @ r_h) / m

        x_history.append(x)
        f_history.append(cur_f)
        grad_history.append(g)

        if cur_f <= f_min:
            status = "Converged"
            break

        JtJ = J_h.T @ J_h / m
        accepted = False
        for _ in range(max_backtracks):
            H = JtJ + lam * np.diag(np.maximum(np.diag(JtJ), 1e-30))
            try:
                step = np.linalg.solve(H, -0.5 * g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            x_new = x + jnp.asarray(step, dtype=x.dtype)
            r_new = np.asarray(resfn(x_new) if not hasattr(resfn, "value_and_jac")
                               else resfn(x_new))
            f_new = float(r_new @ r_new) / m
            if f_new < cur_f:
                x = x_new
                lam = max(lam * backtrack, 1e-12)
                accepted = True
                break
            lam *= 4.0
        if not accepted:
            status = "Stalled"
            break

    return optResult(x, cur_f, f_history, x_history, grad_history, k, status)


def optimize_lbfgs(f, x_0, N_steps=100, f_min=1e-16, **lbfgs_kwargs):
    """L-BFGS through optax, reporting reference-style histories."""
    import optax

    solver = optax.lbfgs(**lbfgs_kwargs)
    value_and_grad = optax.value_and_grad_from_state(f)

    x = jnp.asarray(x_0)
    state = solver.init(x)
    x_history, f_history, grad_history = [], [], []
    status = "Running"
    cur_f = None
    k = 0

    def step(x, state):
        value, grad = value_and_grad(x, state=state)
        updates, state = solver.update(
            grad, state, x, value=value, grad=grad, value_fn=f
        )
        return optax.apply_updates(x, updates), state, value, grad

    if not hasattr(f, "value_and_grad"):
        # plain callables: jit the whole step; framework loss objects stay
        # eager at this level (their heavy compute is already compiled, and
        # an outer jit would re-embed operator arrays as HLO constants)
        step = jax.jit(step)

    for k in range(N_steps):
        x_new, state, cur_f, g = step(x, state)
        x_history.append(x)
        f_history.append(cur_f)
        grad_history.append(g)
        x = x_new
        if cur_f <= f_min:
            status = "Converged"
            break
        if not np.isfinite(np.asarray(cur_f)):
            status = "Diverged"
            break

    return optResult(x, cur_f, f_history, x_history, grad_history, k, status)
