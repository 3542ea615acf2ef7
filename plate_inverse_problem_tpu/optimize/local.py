"""First/second-order local optimizers (reference Optimizers.py:1-367).

Same algorithms and result record; histories are kept in Python lists so the
Problem-layer report/log writers behave identically.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class FixedParameterFunction:
    """Freeze a subset of parameters of a function
    (reference Optimizers.py:9-56)."""

    def __init__(self, function: Callable, param_size: int,
                 fixed_indices: int | tuple, fixed_values: float | tuple):
        self.func = function
        self.array = np.zeros(param_size)
        self.free_idx = [i for i in range(param_size)]

        if isinstance(fixed_indices, (int, np.integer)):
            assert isinstance(fixed_values, (float, np.floating)), (
                f"got {type(fixed_values)}"
            )
            self.array[fixed_indices] = fixed_values
            self.free_idx.remove(int(fixed_indices))
        else:
            assert len(fixed_indices) == len(fixed_values)
            for i, idx in enumerate(fixed_indices):
                self.array[int(idx)] = fixed_values[i]
                self.free_idx.remove(int(idx))

        self.free_idx = jnp.array(self.free_idx)

    def __call__(self, params, *args):
        modified = jnp.array(self.array)
        modified = modified.at[self.free_idx].set(params)
        return self.func(modified, *args)


def get_sd_and_norm(B, g, lam):
    """(B + lam I)^-1 (-g) and its norm (reference Optimizers.py:59-67).

    Host numpy: the trust-region model is a tiny (n_params^2) dense problem;
    keeping it off-device avoids f64 factorizations on TPU (unsupported) and
    per-iteration dispatch latency."""
    B_cur = B + lam * np.eye(B.shape[0], dtype=B.dtype)
    sd = np.linalg.solve(B_cur, -g)
    return sd, np.linalg.norm(sd)


def solve_trust_region_model(B, g, delta, rtol=1e-6, max_iter=100):
    """Constrained quadratic-model minimisation: lambda doubling then
    bisection until ||p|| <= delta (reference Optimizers.py:70-122)."""
    B = np.asarray(B)
    g = np.asarray(g)
    lams, _ = np.linalg.eigh(B)
    sd = np.linalg.solve(B, -g)
    pnorm = np.linalg.norm(sd)
    if pnorm <= delta:
        predicted_improvement = -(g @ sd + 0.5 * sd.T @ B @ sd)
        if lams.min() >= 0:
            return sd, 0.0, predicted_improvement

    l_left = (-lams).max()
    l_left = 0.0 if l_left < 0 else l_left

    l_right = l_left + 1.0
    sd, pnorm = get_sd_and_norm(B, g, l_right)

    for _ in range(max_iter):
        if pnorm <= delta:
            break
        l_left = l_right
        l_right *= 2.0
        sd, pnorm = get_sd_and_norm(B, g, l_right)

    assert pnorm <= delta, "Failed to find upper bound for lambda"

    lam = l_right
    for _ in range(2 * max_iter):
        if pnorm <= delta and delta - pnorm <= delta * rtol:
            break
        lam = (l_right + l_left) / 2.0
        sd, pnorm = get_sd_and_norm(B, g, lam)
        if pnorm < delta:
            l_right = lam
        else:
            l_left = lam

    if pnorm > delta:
        lam = l_right
        sd, pnorm = get_sd_and_norm(B, g, lam)

    predicted_improvement = -(g @ sd + 0.5 * sd.T @ B @ sd)
    assert predicted_improvement >= 0, (
        "Predicted improvement for quadratic model is negative"
    )
    return sd, lam, predicted_improvement


def _value_and_grad_of(f):
    """Duck-typed (value, grad) oracle.

    Loss objects from ``Problem.getLossFunction`` carry a pre-jitted
    ``value_and_grad`` (with the FEM operator pytree threaded as arguments);
    plain callables fall back to ``jax.value_and_grad``.  The fallback is NOT
    outer-jitted: the heavy compute inside framework losses is already
    compiled, and wrapping it again would re-embed the operator arrays as
    HLO constants (pathological on TPU — see Problem.getFRCore)."""
    if hasattr(f, "value_and_grad"):
        return f.value_and_grad
    return jax.value_and_grad(f)


def get_model_newt(f):
    """(value, grad, dense Hessian) oracle (reference Optimizers.py:125-136)."""
    if hasattr(f, "value_grad_hessian"):
        return f.value_grad_hessian

    gr = jax.grad(f)

    def val_gr(x):
        return f(x), gr(x)

    f_value_and_gradient = jax.jit(val_gr)
    f_hessian = jax.jit(jax.jacobian(gr))

    def _update(x):
        return (*f_value_and_gradient(x), f_hessian(x))

    return _update


optResult = namedtuple(
    "optResult",
    ["x", "f", "f_history", "x_history", "grad_history", "niter", "status"],
)


class _Trace:
    """Iteration bookkeeping shared by the local optimizers: records the
    (x, f, grad) trajectory and produces the optResult record the report /
    log writers consume (reference Optimizers.py:147-150)."""

    def __init__(self):
        self.f, self.x, self.g = [], [], []
        self.status = "Running"

    def record(self, x, f_val, grad):
        self.x.append(x)
        self.f.append(f_val)
        self.g.append(grad)

    def result(self, x, f_val, niter):
        return optResult(x, f_val, self.f, self.x, self.g, niter, self.status)


def optimize_trust_region(f, x_0, N_steps=10, delta_max=1.0, delta=None,
                          eta=0.15, method="newt", steps_to_stall=10):
    """Classic trust-region Newton with 1/4 / 3/4 radius update rules
    (reference Optimizers.py:153-228)."""
    if delta is None:
        delta = delta_max / 10.0
    if eta > 0.25:
        raise ValueError(f"eta should be below 0.25; got {eta:f}")
    if eta < 0:
        raise ValueError(f"eta should be positive; got {eta:f}")

    if method == "newt":
        update_model = get_model_newt(f)
    else:
        raise NotImplementedError(f"Method <<{method}>> not implemented")

    trace = _Trace()
    model_update_required = True
    steps_without_update = 0
    x = x_0
    cur_f = g = B = None
    k = 0

    for k in range(N_steps):
        if model_update_required:
            cur_f, g, B = update_model(x)
            g = np.asarray(g)
            B = np.asarray(B)

        try:
            sd, lam, predicted_improvement = solve_trust_region_model(B, g, delta)
        except AssertionError as e:
            trace.status = str(e)
            break

        new_f = f(x + sd)
        rel_improvement = (cur_f - new_f) / predicted_improvement

        # classic radius update: shrink on poor model agreement, grow when
        # the step was radius-limited and the model was trustworthy
        if rel_improvement < 0.25:
            delta /= 4.0
        elif rel_improvement >= 0.75 and lam > 0.0:
            delta = min(2.0 * delta, delta_max)

        if rel_improvement >= eta:
            x = x + sd
            model_update_required = True
            steps_without_update = 0
        else:
            model_update_required = False
            steps_without_update += 1

        trace.record(x, cur_f, g)

        if cur_f < 1e-16:
            trace.status = "Converged"
            break
        if steps_without_update >= steps_to_stall:
            trace.status = "Stalled"
            break
    return trace.result(x, cur_f, k)


def optimize_gd(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Plain gradient descent (reference Optimizers.py:231-254)."""
    value_and_gradient = _value_and_grad_of(f)
    x = x_0
    trace = _Trace()
    cur_f = None
    k = 0

    for k in range(N_steps):
        cur_f, g = value_and_gradient(x)
        trace.record(x, cur_f, g)
        if cur_f <= f_min:
            trace.status = "Converged"
            break
        x = x - h * g

    return trace.result(x, cur_f, k)


def optimize_cd(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Coordinate descent via masked full gradients (reference Optimizers.py:257-287)."""
    value_and_gradient = _value_and_grad_of(f)
    x = x_0
    n = x_0.size
    assert n >= 2
    coord_mask = jnp.eye(n)
    trace = _Trace()
    cur_f = None
    k = 0

    for k in range(N_steps):
        for i in range(n):
            cur_f, g = value_and_gradient(x)
            g = g * coord_mask[i]
            trace.record(x, cur_f, g)
            if cur_f <= f_min:
                trace.status = "Converged"
                break
            x = x - h * g

    return trace.result(x, cur_f, k)


def optimize_cd_mem(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Memory-lean coordinate descent using the fixed-parameter wrapper
    (reference Optimizers.py:290-323)."""
    f_ = f if hasattr(f, "value_and_grad") else jax.jit(f)
    x = x_0
    n = x_0.size
    assert n >= 2
    others = jnp.reshape(jnp.where(jnp.eye(n) == 0)[1], (n, n - 1))
    coord_mask = jnp.eye(n)
    trace = _Trace()
    cur_f = None
    k = 0

    for k in range(N_steps):
        for i in range(n):
            fixed_f = FixedParameterFunction(
                f_, n, tuple(np.asarray(others[i])), tuple(np.asarray(x[others[i]]))
            )
            cur_f, g = jax.value_and_grad(fixed_f)(x[fixed_f.free_idx])
            g_full = coord_mask[i] * g[0]
            trace.record(x, cur_f, g_full)
            if cur_f <= f_min:
                trace.status = "Converged"
                break
            x = x - h * g_full

    return trace.result(x, cur_f, k)


def optimize_cd_mem2(f, x_0, N_steps=100, h=0.01, f_min=1e-8):
    """Coordinate descent with per-coordinate adaptive step + backtracking
    (reference Optimizers.py:326-367)."""

    def fixed(x, i, other):
        return f(jnp.insert(other, i, x))

    if hasattr(f, "value_and_grad"):
        f_ = fixed
        vg = jax.value_and_grad(fixed)
    else:
        f_ = jax.jit(fixed, static_argnums=1)
        vg = jax.jit(jax.value_and_grad(fixed), static_argnums=1)

    x = x_0
    n = x_0.size
    assert n >= 2
    others = jnp.reshape(jnp.where(jnp.eye(n) == 0)[1], (n, n - 1))
    step_sizes = np.full(n, h)
    coord_mask = jnp.eye(n)
    trace = _Trace()
    cur_f = None
    k = 0

    for k in range(N_steps):
        for i in range(n):
            cur_f, g = vg(x[i], i, x[others[i]])
            g_full = coord_mask[i] * g
            trace.record(x, cur_f, g_full)
            if cur_f <= f_min:
                trace.status = "Converged"
                break
            x = x - step_sizes[i] * g_full
            # per-coordinate backtracking: if the step increased the loss,
            # shrink this coordinate's step and retry from the last iterate
            if f_(x[i], i, x[others[i]]) > trace.f[-1]:
                step_sizes[i] /= 5
                x = trace.x[-1] - step_sizes[i] * g_full

    return trace.result(x, cur_f, k)
