"""Frequency-axis (and DOF-axis) sharding of the FRF sweep.

GSPMD style, per the scaling-book recipe: build a Mesh, annotate shardings on
the inputs (and key internal tensors), and let XLA place the collectives on
ICI.  Works identically on a real TPU pod slice and on a CPU host with
``xla_force_host_platform_device_count`` virtual devices (the test/dry-run
path).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.problem import _has_adjoint_hooks, _ref_abs, _split_ref


def make_mesh(n_devices: int | None = None, dof_axis: int = 1) -> Mesh:
    """Device mesh with a ``freq`` axis (and optional ``dof`` axis).

    ``n_devices`` defaults to all local devices; ``dof_axis`` > 1 splits
    devices between the frequency and DOF axes (freq gets the rest).
    """
    devs = np.asarray(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = devs.size
    if n % dof_axis != 0:
        raise ValueError(f"{n} devices not divisible by dof_axis={dof_axis}")
    grid = devs.reshape(n // dof_axis, dof_axis)
    return Mesh(grid, ("freq", "dof"))


def shard_frequencies(mesh: Mesh, freqs: jax.Array) -> jax.Array:
    """Place a frequency array with its leading axis split over ``freq``.

    Pads to a multiple of the freq-axis size if needed (padding frequencies
    repeat the last entry; callers slice the result back).
    """
    nf = mesh.shape["freq"]
    freqs = jnp.asarray(freqs)
    rem = (-freqs.shape[0]) % nf
    if rem:
        freqs = jnp.concatenate(
            [freqs, jnp.repeat(freqs[-1:], rem, axis=0)])
    return jax.device_put(freqs, NamedSharding(mesh, P("freq")))


def opdata_shardings(mesh: Mesh, opdata):
    """Sharding tree for the operator pytree: the DOF-heavy operands are
    row-partitioned over the ``dof`` mesh axis, the rest replicated.

    What actually shards (explicit GSPMD annotations, SURVEY §2.4 TP row):

    * ``invK32`` (n, n) — the mixed engine's dense complement
      preconditioner, by far the largest buffer (O(n^2)): each dof-shard
      holds n/D rows; the per-iteration GEMM computes its row block and
      XLA all-gathers the (n,)-sized product — O(n) comm for O(n^2/D)
      compute, the classic row-parallel pattern.  An n=20k preconditioner
      (1.6 GB f32) stops fitting alongside the sweep on one chip; a dof=2
      split halves it per device.
    * ``W64`` (n, m) — the band-basis panel: row-sharded; the Rayleigh-Ritz
      panel products contract over the sharded axis (psum of (m, m)).

    * the band-tier / two-grid buffers — the ones that are actually large
      at the >12k tier where dof-sharding matters: ``mg_band0``
      (nb, b, 3b block-tridiagonal operator) and ``mg_Pt`` (the
      rectangular block-band prolongation) split over their block-row
      axis (XLA inserts the halo exchanges the shifted-window products
      need), ``mg_Kcinv`` (coarse dense inverse) row-sharded like
      ``invK32``, ``mg_dinv`` (the n-length Jacobi diagonal) split over
      its only axis.

    Everything else (flat operator data, index vectors, lifts) is
    replicated — sharding the nnz axis would trade O(F n) psums per SpMV
    for O(F nnz / D) local work, a loss at the plate operator's ~23
    nnz/row.
    """
    repl = NamedSharding(mesh, P())
    ndof = mesh.shape.get("dof", 1)

    _row_sharded_2d = ("invK32", "W64", "mg_Kcinv")
    _block_sharded = ("mg_band0", "mg_Pt")

    def place(path, leaf):
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        if ndof <= 1 or leaf.ndim == 0 or leaf.shape[0] % ndof or \
                leaf.shape[0] <= 1:
            return repl
        if name in _row_sharded_2d and leaf.ndim == 2:
            return NamedSharding(mesh, P("dof", None))
        if name in _block_sharded and leaf.ndim >= 2:
            return NamedSharding(
                mesh, P(*(("dof",) + (None,) * (leaf.ndim - 1))))
        if name == "mg_dinv" and leaf.ndim == 1:
            return NamedSharding(mesh, P("dof"))
        return repl

    return jax.tree_util.tree_map_with_path(place, opdata)


def sharded_fr_function(problem, mesh: Mesh):
    """Sharded version of ``Problem.getFRFunction``.

    Frequencies arrive split over the ``freq`` axis.  The FR core and the
    operator pytree come from ``Problem.getFRCore`` — operator arrays are
    jit *arguments* (replicated over the mesh), never closure constants.
    Returns ``fn(freqs_sharded, params) -> fr`` (output sharded over 'freq';
    callers slice off padding).
    """
    core, opdata = problem.getFRCore()
    repl = NamedSharding(mesh, P())
    fshard = NamedSharding(mesh, P("freq"))
    od_shardings = opdata_shardings(mesh, opdata)

    def fn(freqs, params, od):
        fr = core(freqs, params, od)
        return jax.lax.with_sharding_constraint(fr, fshard)

    jitted = jax.jit(
        fn,
        in_shardings=(fshard, repl, od_shardings),
        out_shardings=fshard,
    )

    def wrapper(freqs, params):
        return jitted(freqs, params, opdata)

    return wrapper


def sharded_train_step(problem, mesh: Mesh, loss_type: str = "MSE_LOG_AFC",
                       lr: float = 1e-3):
    """One full inverse-iteration step — loss + grad + parameter update —
    jit-compiled over the device mesh.

    The FRF residual is computed with frequencies sharded over ``freq``;
    the scalar loss reduction and the parameter gradient are psum'd by XLA
    from the sharding annotations (the only cross-chip traffic, matching
    SURVEY §2.4's analysis).  Returns ``step(freqs, ref_fr, params) ->
    (loss, grad, new_params)``; pass the *unpadded* frequency/reference
    arrays — the step pads them to the freq-axis size itself and masks the
    padding out of the loss and gradient, so every true frequency carries
    equal weight regardless of the device count.
    """
    core, opdata = problem.getFRCore()

    def loss_fn(params, freqs, ref, n_true, od):
        # ref is the (F, 2) re/im split (complex128 is not a TPU dtype)
        fr = core(freqs, params, od)
        if loss_type == "MSE_LOG_AFC":
            err = (jnp.log(jnp.abs(fr)) - jnp.log(_ref_abs(ref))) ** 2
        else:
            err = ((jnp.real(fr) - ref[..., 0]) ** 2
                   + (jnp.imag(fr) - ref[..., 1]) ** 2)
        # entries past n_true are pad duplicates of the last frequency:
        # zero their weight so they don't skew the mean
        live = jnp.arange(err.shape[0]) < n_true
        return jnp.sum(jnp.where(live, err, 0.0)) / n_true

    def step(freqs, ref, n_true, params, od):
        loss, g = jax.value_and_grad(loss_fn)(params, freqs, ref, n_true, od)
        return loss, g, params - lr * g

    repl = NamedSharding(mesh, P())
    fshard = NamedSharding(mesh, P("freq"))
    od_shardings = opdata_shardings(mesh, opdata)
    jitted = jax.jit(
        step,
        in_shardings=(fshard, fshard, repl, repl, od_shardings),
        out_shardings=(repl, repl, repl),
    )

    def wrapper(freqs, ref, params):
        n_true = jnp.asarray(freqs).shape[0]
        fs = shard_frequencies(mesh, jnp.asarray(freqs))
        rs = shard_frequencies(mesh, _split_ref(ref))
        return jitted(fs, rs, n_true, params, opdata)

    return wrapper


def sharded_gn_step(problem, mesh: Mesh, kind: str = "log_afc",
                    damping: float = 0.0, jac_mode: str = "auto"):
    """One Gauss-Newton iteration over the device mesh — the multi-chip
    version of ``ResidualFunction.value_and_jac`` + normal equations.

    The residual rows are per-frequency, so both r and the Jacobian J
    shard over the ``freq`` axis with zero cross-chip traffic; the only
    collectives are the (p, p) / (p,) contractions J^T J and J^T r, which
    XLA reduces over ICI from the sharding annotations.  The tiny damped
    normal solve runs on the host in f64 (TPU has no 64-bit
    factorization; p is 3-10).

    ``jac_mode`` mirrors ``ResidualFunction``: 'adjoint' (2 solves per
    frequency — primal + one batched adjoint — plus p solve-free passes,
    independent of the parameter count; needs the mixed engine's core
    hooks), 'fwd' (fused value-and-jacfwd, 1+p solves), or 'auto'
    (adjoint when available).  Padding rows mask exactly in both modes:
    masked residual rows give zero adjoint cotangents, hence zero
    adjoint solutions and zero Jacobian rows.

    Returns ``step(freqs, ref_fr, params, damping=None) -> (rsq,
    new_params)`` taking *unpadded* host arrays; padding rows are masked to
    zero weight.  ``damping`` overrides the constructor default per call —
    it only touches the host-side normal solve, so Levenberg-Marquardt
    retry loops reuse the one compiled mesh program.

    Big-DOF sweeps are segmented across device calls exactly like
    ``ResidualFunction`` (the axon runtime kills single executions beyond
    ~a minute; an r+J call is ~(1+p) sweeps of work): the per-call
    frequency budget is ``problem._call_segment(jac=True)`` *per chip*,
    and the J^T J / J^T r / |r|^2 ingredients accumulate across segments
    on the host — GN's normal equations are sums over rows, so host
    accumulation is exact.
    """
    _damping = damping
    core, opdata = problem.getFRCore()
    nf_axis = mesh.shape["freq"]
    if kind not in ("log_afc", "afc"):
        raise ValueError(f"unsupported sharded-GN residual kind {kind!r}")

    adjoint_ok = _has_adjoint_hooks(core)
    if jac_mode == "auto":
        jac_mode = "adjoint" if adjoint_ok else "fwd"
    elif jac_mode == "adjoint" and not adjoint_ok:
        raise ValueError("jac_mode='adjoint' needs a core exposing the "
                         "adjoint hooks (mixed-engine cores do).")
    elif jac_mode not in ("adjoint", "fwd"):
        raise ValueError(f"Unknown jac_mode {jac_mode!r}.")

    seg_per_chip = problem._call_segment(jac=True,
                                         adjoint=jac_mode == "adjoint")
    call_budget = None if seg_per_chip is None else seg_per_chip * nf_axis

    def _resid_of_fr(fr, ref, n_true):
        # ref is the (F, 2) re/im split (complex128 is not a TPU dtype)
        if kind == "log_afc":
            r = jnp.log(jnp.abs(fr)) - jnp.log(_ref_abs(ref))
        else:
            r = jnp.abs(fr) - _ref_abs(ref)
        live = jnp.arange(r.shape[0]) < n_true
        return jnp.where(live, r, 0.0)

    def resid(params, freqs, ref, n_true, od):
        return _resid_of_fr(core(freqs, params, od), ref, n_true)

    def ingredients_fwd(freqs, ref, n_true, params, od):
        f = lambda th: resid(th, freqs, ref, n_true, od)
        basis = jnp.eye(params.shape[0], dtype=params.dtype)
        r, Jrows = jax.vmap(
            lambda v: jax.jvp(f, (params,), (v,)), out_axes=(None, 0)
        )(basis)
        J = jnp.moveaxis(Jrows, 0, -1)       # (F, p), sharded over freq
        # freq-axis contractions: XLA inserts the psum over the mesh
        return jnp.sum(r * r), J.T @ J, J.T @ r

    def ingredients_adjoint(freqs, ref, n_true, params, od):
        # the adjoint-Jacobian recipe of ResidualFunction, sharded: every
        # per-frequency quantity (U, G, Y, the psi rows) lives on its
        # frequency's chip; masked rows have zero cotangents -> zero
        # adjoint solutions -> zero J rows, so padding masks exactly
        U_re, U_im = core.sweep_u(freqs, params, od)
        U_re = jax.lax.stop_gradient(U_re)
        U_im = jax.lax.stop_gradient(U_im)

        def r_of_U(Ur, Ui):
            return _resid_of_fr(core.readout_ui(Ur, Ui, od), ref, n_true)

        r, pb = jax.vjp(r_of_U, U_re, U_im)
        G_re, G_im = pb(jnp.ones_like(r))
        Y_re, Y_im = core.sweep_adj(
            freqs, params, od,
            G_re.astype(jnp.float64), G_im.astype(jnp.float64))
        Y_re = jax.lax.stop_gradient(Y_re)
        Y_im = jax.lax.stop_gradient(Y_im)

        def psi(p):
            R_re, R_im = core.apply_res(freqs, p, od, U_re, U_im)
            return jnp.sum(Y_re * R_re + Y_im * R_im, axis=-1)

        J = -jax.jacfwd(psi)(params)         # (F, p), sharded over freq
        return jnp.sum(r * r), J.T @ J, J.T @ r

    ingredients = (ingredients_adjoint if jac_mode == "adjoint"
                   else ingredients_fwd)

    repl = NamedSharding(mesh, P())
    fshard = NamedSharding(mesh, P("freq"))
    od_shardings = opdata_shardings(mesh, opdata)
    jitted = jax.jit(
        ingredients,
        in_shardings=(fshard, fshard, repl, repl, od_shardings),
        out_shardings=(repl, repl, repl),
    )

    def _ingredients_all(freqs, ref, params):
        """(rsq, JtJ, Jtr) over the full frequency set, segmented across
        device calls when the per-call budget demands it."""
        freqs = jnp.asarray(freqs)
        ref = _split_ref(ref)
        F = int(freqs.shape[0])
        if call_budget is None or F <= call_budget:
            fs = shard_frequencies(mesh, freqs)
            rs = shard_frequencies(mesh, ref)
            rsq, JtJ, Jtr = jitted(fs, rs, F, params, opdata)
            return float(rsq), JtJ, Jtr
        # equal-shape segments (one compile): pad to a multiple of the
        # budget by repeating the last frequency, mask via per-segment
        # true counts
        n_seg = -(-F // call_budget)
        pad = n_seg * call_budget - F
        fpad = jnp.concatenate([freqs, jnp.repeat(freqs[-1:], pad)])
        rpad = jnp.concatenate([ref, jnp.repeat(ref[-1:], pad, axis=0)])
        rsq_acc, JtJ_acc, Jtr_acc = 0.0, None, None
        for s in range(n_seg):
            lo = s * call_budget
            n_true = call_budget if s < n_seg - 1 else call_budget - pad
            fs = shard_frequencies(mesh, fpad[lo:lo + call_budget])
            rs = shard_frequencies(mesh, rpad[lo:lo + call_budget])
            rsq, JtJ, Jtr = jitted(fs, rs, n_true, params, opdata)
            rsq_acc += float(rsq)
            JtJ_acc = JtJ if JtJ_acc is None else JtJ_acc + JtJ
            Jtr_acc = Jtr if Jtr_acc is None else Jtr_acc + Jtr
        return rsq_acc, JtJ_acc, Jtr_acc

    def step(freqs, ref, params, damping: float | None = None):
        lam = float(damping if damping is not None else _damping)
        params = jnp.asarray(params)
        rsq, JtJ, Jtr = _ingredients_all(freqs, ref, params)
        A = np.array(JtJ, np.float64)
        # Marquardt (multiplicative) damping — scale-invariant, which
        # matters with UNSCALED physical parameters whose J^T J diagonals
        # span ~20 orders of magnitude (an absolute/max-relative floor
        # would silently crush the stiff directions).  A ~zero diagonal
        # means the parameter is unidentifiable on the sampled band: no
        # damping makes that step meaningful, so pin the direction
        # (dx_i = 0) and solve the identifiable subsystem.
        d = A.diagonal()
        live = d > d.max() * 1e-300 if d.max() > 0 else np.zeros_like(d, bool)
        dx = np.zeros(A.shape[0])
        if live.any():
            As = A[np.ix_(live, live)].copy()
            As[np.diag_indices_from(As)] *= 1.0 + lam
            dx[live] = np.linalg.solve(
                As, -np.asarray(Jtr, np.float64)[live])
        return float(rsq), params + jnp.asarray(dx, params.dtype)

    step.jac_mode = jac_mode
    return step
