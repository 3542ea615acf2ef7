"""Problem: orchestration, forward FRF model, losses, inverse driver.

TPU-native re-design of the reference's ``jax_plate/Problem.py`` (:38-980)
with the same public surface:

* ``Problem(geometry, material, accel, ref_fr, spath=...)`` — the setup.json
  folder convention included (Problem.py:103-214);
* ``getFRFunction()`` -> jit-compiled ``(freqs, params) -> fr`` (Problem.py:377-518);
* ``solveForward`` / ``solveInverse`` / ``solveInverseLocal`` (Problem.py:611-921);
* ``getLossFunction`` with MSE / RMSE / MSE_AFC / MSE_LOG_AFC (Problem.py:933-980);
* ``getModePicture`` (Problem.py:521-608) rendered directly from our mesh —
  no FreeFEM subprocess.

Differences by design: FEM operators come from the on-device assembly layer
(``fem.assembly``); the frequency batch is solved by the modal-resolvent or
chunked dense-LU engine (``ops.sweep``) instead of the C++/UMFPACK callback;
the whole forward+loss+gradient graph stays inside one jit.
"""
from __future__ import annotations

import functools
import json
import os
import warnings
from time import perf_counter
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import numpy.typing as npt

from ..config import default_precision
from ..fem.assembly import (
    MODULI_INDICES,
    accel_indicator,
    assemble_symm,
    assemble_unsymm,
)
from ..io.compress import Compressor
from ..io.report import default_uid, write_log, write_report
from ..ops.sweep import sweep_solve
from ..optimize import (
    optResult,
    optimize_cd,
    optimize_cd_mem2,
    optimize_gd,
    optimize_trust_region,
    optimize_newton,
    optimize_lbfgs,
)  # optimize_gauss_newton imported lazily in solveInverse
from ..utils.paths import get_repo_dir
from .accelerometer import Accelerometer, AccelerometerParams
from .geometry import Geometry, GeometryParams
from .materials import Material, get_material

# HBM budget (bytes) for one fused-apply contribution tensor of the
# adjoint-Jacobian residual map — sets its frequency chunk (see
# _attach_adjoint_hooks.apply_res); module-level so tests can shrink it
# to exercise the chunked path on small meshes
_APPLY_BUDGET = 100e6


def _split_ref(reference_fr):
    """Device the reference FRF as an (F, 2) (re, im) real stack.

    complex128 is not a TPU dtype: ``jnp.asarray`` of a complex128 numpy
    reference kills the backend at device_put ('TPU backend setup/compile
    error (Unavailable)', measured on the north-star probe) before any
    compute runs.  Real references get a zero imaginary lane so every loss/
    residual kind sees one layout.
    """
    r = np.asarray(reference_fr)
    if np.iscomplexobj(r):
        return jnp.stack([jnp.asarray(r.real), jnp.asarray(r.imag)], axis=-1)
    rr = jnp.asarray(r)
    return jnp.stack([rr, jnp.zeros_like(rr)], axis=-1)


def _ref_abs2(ref):
    """|ref|^2 from the split (re, im) layout."""
    return ref[..., 0] ** 2 + ref[..., 1] ** 2


def _ref_abs(ref):
    """|ref| from the split (re, im) layout.

    ``hypot`` rather than ``sqrt(re^2 + im^2)``: the squared magnitude
    under/overflows for |ref| beyond ~1e±154, which would turn the log-AFC
    losses into -inf/inf where log(abs(complex)) is exact."""
    return jnp.hypot(ref[..., 0], ref[..., 1])


def _hoist_split_transform(transform, n_params, dtype=jnp.float64):
    """closure_convert the split material transform so per-instance constant
    arrays (e.g. a SOL laminate's Q->(A,B,D) maps from q_to_abd_matrices)
    flow as jit ARGUMENTS instead of lowering to HLO constants.

    Problems that differ only in those values — the multi-cut laminate
    angles of a joint identification (examples/joint_identification.py) —
    then produce byte-identical HLO and share ONE XLA executable /
    persistent-cache entry; without this, every cut pays the full
    scale-tier compile (~3x measured on the 3-cut north-star probe).

    Returns ``(fn, consts)`` with ``fn(params, omega, *consts)``; ``consts``
    ride in opdata (replicated by parallel.opdata_shardings).

    (jax.closure_convert is NOT this: it hoists only closed-over *tracers*,
    baking concrete arrays into the jaxpr as constants.)
    """
    closed, out_shape = jax.make_jaxpr(transform, return_shape=True)(
        jnp.zeros((n_params,), dtype), jnp.zeros((), dtype))
    out_tree = jax.tree_util.tree_structure(out_shape)
    # hoist every ARRAY const, 0-d included — a family whose per-instance
    # value traces as a 0-d array would otherwise bake into the HLO and
    # silently break the one-executable-per-family sharing; only Python
    # scalars / weak-typed literals stay baked (genuinely family-level)
    hoist_ix = [i for i, c in enumerate(closed.consts)
                if isinstance(c, (jax.Array, np.ndarray))]
    baked = list(closed.consts)

    def converted(params, omega, *hoisted):
        cs = list(baked)
        for i, hval in zip(hoist_ix, hoisted):
            cs[i] = hval
        out = jax.core.eval_jaxpr(closed.jaxpr, cs, params, omega)
        return jax.tree_util.tree_unflatten(out_tree, out)

    return converted, [jnp.asarray(closed.consts[i]) for i in hoist_ix]


class LossFunction:
    """Scalar loss with pre-jitted derivative oracles.

    Callable as ``f(params) -> scalar`` (drop-in for the reference's jitted
    closure, Problem.py:980).  ``grad``/``value_and_grad``/``hessian``/
    ``value_grad_hessian`` are jit-compiled with the operator pytree passed
    as arguments (see Problem.getFRCore for why closures are not an option
    on TPU).
    """

    def __init__(self, core, opdata, frequencies, reference_fr, func_type,
                 scaling_params=None, call_seg=None):
        self._opdata = opdata
        self._freqs = jnp.asarray(frequencies)
        self._ref = _split_ref(reference_fr)   # (F, 2): TPU-legal re/im
        self.func_type = func_type

        if scaling_params is None:
            scaling = 1.0
        else:
            scaling = jnp.asarray(scaling_params)

        if func_type == "MSE":
            def term(fr, ref):
                d_re = jnp.real(fr) - ref[..., 0]
                d_im = jnp.imag(fr) - ref[..., 1]
                return d_re ** 2 + d_im ** 2
        elif func_type == "RMSE":
            def term(fr, ref):
                d_re = jnp.real(fr) - ref[..., 0]
                d_im = jnp.imag(fr) - ref[..., 1]
                return (d_re ** 2 + d_im ** 2) / _ref_abs2(ref)
        elif func_type == "MSE_AFC":
            def term(fr, ref):
                return (jnp.abs(fr) - _ref_abs(ref)) ** 2
        elif func_type == "MSE_LOG_AFC":
            def term(fr, ref):
                return (jnp.log(jnp.abs(fr)) - jnp.log(_ref_abs(ref))) ** 2
        else:
            raise ValueError(f'Function type "{func_type}" is not supported!')

        def full(params, od, freqs, ref):
            fr = core(freqs, params * scaling, od)
            return jnp.mean(term(fr, ref))

        self._full = full
        self._value = jax.jit(full)
        self._vg = jax.jit(jax.value_and_grad(full))
        self._g = jax.jit(jax.grad(full))
        self._hess = None
        self._vgh = None

        # host-level call segmentation (big-DOF sweeps on the tunneled TPU
        # runtime, see Problem._call_segment): every loss type is a MEAN of
        # per-frequency terms, so the loss and all its derivatives decompose
        # into weighted per-segment SUMS computed in separate device calls
        # (padded entries carry weight zero).
        F = int(self._freqs.shape[0])
        self._segments = None
        if call_seg is not None and F > call_seg:
            n_seg = -(-F // call_seg)
            pad = n_seg * call_seg - F
            fpad = jnp.concatenate(
                [self._freqs, jnp.repeat(self._freqs[-1:], pad)])
            rpad = jnp.concatenate(
                [self._ref, jnp.repeat(self._ref[-1:], pad, axis=0)])
            w = jnp.concatenate([jnp.ones(F), jnp.zeros(pad)])
            self._segments = (fpad.reshape(n_seg, call_seg),
                              rpad.reshape(n_seg, call_seg, 2),
                              w.reshape(n_seg, call_seg), float(F))

            def fullsum(params, od, fs, refs, ws):
                fr = core(fs, params * scaling, od)
                return jnp.sum(ws * term(fr, refs))

            self._fullsum = fullsum
            self._sum_v = jax.jit(fullsum)
            self._sum_vg = jax.jit(jax.value_and_grad(fullsum))
            self._sum_h = None

    def _seg_reduce(self, fn, params):
        fseg, rseg, wseg, F = self._segments
        acc = None
        for i in range(fseg.shape[0]):
            out = fn(params, self._opdata, fseg[i], rseg[i], wseg[i])
            acc = out if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, out)
        return jax.tree_util.tree_map(lambda a: a / F, acc)

    def pure(self):
        """``(fn, aux)`` with ``fn(params, *aux) -> scalar`` traceable.

        The compiled optimizers (optimize.local) trace ``fn`` inside their
        scan loops and thread ``aux`` — the operator pytree, frequencies and
        reference FRF — as jit arguments, keeping the FEM arrays out of the
        HLO constant pool (see Problem.getFRCore)."""
        return self._full, (self._opdata, self._freqs, self._ref)

    def __call__(self, params):
        if self._segments is not None:
            return self._seg_reduce(self._sum_v, params)
        return self._value(params, self._opdata, self._freqs, self._ref)

    def value_and_grad(self, params):
        if self._segments is not None:
            return self._seg_reduce(self._sum_vg, params)
        return self._vg(params, self._opdata, self._freqs, self._ref)

    def grad(self, params):
        if self._segments is not None:
            return self._seg_reduce(self._sum_vg, params)[1]
        return self._g(params, self._opdata, self._freqs, self._ref)

    def hessian(self, params):
        if self._segments is not None:
            if self._sum_h is None:
                self._sum_h = jax.jit(jax.jacfwd(jax.grad(self._fullsum)))
            return self._seg_reduce(self._sum_h, params)
        if self._hess is None:
            self._hess = jax.jit(jax.jacfwd(jax.grad(self._full)))
        return self._hess(params, self._opdata, self._freqs, self._ref)

    def value_grad_hessian(self, params):
        """(f, grad, dense Hessian) — the trust-region model oracle
        (reference Optimizers.py:125-136)."""
        if self._segments is not None:
            v, g = self.value_and_grad(params)
            return v, g, self.hessian(params)
        if self._vgh is None:
            vg = jax.value_and_grad(self._full)
            hess = jax.jacfwd(jax.grad(self._full))

            def all3(params, od, freqs, ref):
                v, g = vg(params, od, freqs, ref)
                return v, g, hess(params, od, freqs, ref)

            self._vgh = jax.jit(all3)
        return self._vgh(params, self._opdata, self._freqs, self._ref)


# engine-core attributes the adjoint Gauss-Newton Jacobian needs (primal /
# adjoint sweeps, the explicit residual map, the solve-free readout).  ONE
# predicate shared by every adjoint-mode selector: a core with only some of
# the hooks must look non-adjoint everywhere at once, or the call
# segmentation / freq-chunk policies would size for a mode that never runs.
_ADJOINT_HOOKS = ("sweep_u", "sweep_adj", "apply_res", "readout_ui")


def _has_adjoint_hooks(core) -> bool:
    return all(hasattr(core, a) for a in _ADJOINT_HOOKS)


class ResidualFunction:
    """Vector residual r(theta) with a pre-jitted Jacobian oracle for
    Gauss-Newton (the BASELINE north-star optimizer).

    kinds: 'log_afc' (r_i = log|fr_i| - log|ref_i|; GN on it is the
    Gauss-Newton counterpart of MSE_LOG_AFC), 'afc' (|fr| - |ref|),
    'complex' (stacked re/im of fr - ref).

    Jacobian modes (``jac_mode``):

    * 'adjoint' — the scalar-readout adjoint Jacobian: each residual row
      is a per-frequency SCALAR, so J costs exactly 2 batched solves
      (primal + one adjoint solve A^T y_i = dr_i/dU_i) plus p solve-free
      jacfwd passes through the explicit residual map
      psi_i(theta) = y_i . (A_i(theta) U_i - b_i(theta)), J = -dpsi/dtheta
      — INDEPENDENT of the parameter count.  Measured at n=21k on chip:
      the jacfwd mode costs ~7 sweep-equivalents per iteration at p=3
      (.probes/gn_tune.py), the adjoint mode ~2.5.  Requires the engine
      to expose sweep_u/sweep_adj/apply_res/readout_ui hooks (the mixed
      engine does) and a per-frequency scalar kind ('log_afc'/'afc').
    * 'fwd' — fused value-and-jacfwd: p implicit-diff JVP solves ride
      alongside the primal.  Works with every engine and kind.
    * 'auto' (default) — 'adjoint' when available, else 'fwd'.
    """

    def __init__(self, core, opdata, frequencies, reference_fr, kind="log_afc",
                 scaling_params=None, freq_chunk: int | None = None,
                 call_seg: int | None = None, jac_mode: str = "auto"):
        self._opdata = opdata
        self._freqs = jnp.asarray(frequencies)
        self._ref = _split_ref(reference_fr)   # (F, 2): TPU-legal re/im
        self.kind = kind
        self._chunk = freq_chunk
        scaling = 1.0 if scaling_params is None else jnp.asarray(scaling_params)

        if kind == "log_afc":
            def resid(fr, ref):
                return jnp.log(jnp.abs(fr)) - jnp.log(_ref_abs(ref))
        elif kind == "afc":
            def resid(fr, ref):
                return jnp.abs(fr) - _ref_abs(ref)
        elif kind == "complex":
            def resid(fr, ref):
                d_re = jnp.real(fr) - ref[..., 0]
                d_im = jnp.imag(fr) - ref[..., 1]
                return jnp.concatenate([d_re, d_im])
        else:
            raise ValueError(f"Unknown residual kind {kind!r}.")

        def full(params, od, freqs, ref):
            fr = core(freqs, params * scaling, od)
            return resid(fr, ref)

        self._r = jax.jit(full)

        def rj(params, od, freqs, ref):
            # fused value-and-jacfwd: one jvp per parameter, with the primal
            # shared across tangent lanes.  Computing r separately and then
            # jacfwd(full) would run the primal sweep twice — XLA does not
            # CSE the two while_loop-based solver bodies — costing one extra
            # full sweep per Gauss-Newton iteration.
            f = lambda th: full(th, od, freqs, ref)
            basis = jnp.eye(params.shape[0], dtype=params.dtype)
            r, Jrows = jax.vmap(
                lambda v: jax.jvp(f, (params,), (v,)), out_axes=(None, 0)
            )(basis)
            return r, jnp.moveaxis(Jrows, 0, -1)

        def rj_chunked(params, od, freqs, ref):
            # bound peak memory: the Jacobian holds p tangent solution
            # batches; chunking the frequency axis caps them at chunk size
            c = self._chunk
            F = freqs.shape[0]
            n_chunks = -(-F // c)
            pad = n_chunks * c - F
            fpad = jnp.concatenate([freqs, jnp.repeat(freqs[-1:], pad)])
            rpad = jnp.concatenate([ref, jnp.repeat(ref[-1:], pad, axis=0)])

            def one(args):
                fc, rc = args
                return rj(params, od, fc, rc)

            rs, Js = jax.lax.map(
                one, (fpad.reshape(n_chunks, c), rpad.reshape(n_chunks, c, 2))
            )
            return rs.reshape(-1)[:F], Js.reshape(-1, Js.shape[-1])[:F]

        if freq_chunk is not None and kind == "complex":
            raise ValueError(
                "freq_chunk is only supported for per-frequency scalar "
                "residual kinds ('log_afc', 'afc')."
            )

        adjoint_ok = kind in ("log_afc", "afc") and _has_adjoint_hooks(core)
        if jac_mode == "auto":
            jac_mode = "adjoint" if adjoint_ok else "fwd"
        elif jac_mode == "adjoint" and not adjoint_ok:
            raise ValueError(
                "jac_mode='adjoint' needs a per-frequency scalar residual "
                "kind ('log_afc'/'afc') and an engine exposing the adjoint "
                "hooks (mixed engine cores do)."
            )
        elif jac_mode not in ("adjoint", "fwd"):
            raise ValueError(f"Unknown jac_mode {jac_mode!r}.")
        self.jac_mode = jac_mode
        if jac_mode == "adjoint" and freq_chunk is not None:
            # the adjoint r+J never materializes per-parameter solution
            # batches, so the jacfwd chunking knob has nothing to bound
            # there (its memory is governed by the engine's own sweep/apply
            # chunking) — honoring it silently as a no-op would hide a
            # caller's intent to cap memory
            warnings.warn(
                "freq_chunk only bounds the jacfwd Jacobian; the adjoint "
                "jac_mode ignores it (memory is bounded by the engine's "
                "sweep/apply chunking). Pass jac_mode='fwd' to chunk, or "
                "drop freq_chunk.", RuntimeWarning, stacklevel=2)

        def rj_adjoint(params, od, freqs, ref):
            # 2 solves total: primal sweep + ONE batched adjoint solve.
            # U and Y are constants of the Jacobian formula (their theta-
            # derivatives are what the adjoint identity eliminates), so
            # both sweeps run outside any differentiation; the only
            # differentiated graph is the solve-free residual map.
            th = params * scaling
            U_re, U_im = core.sweep_u(freqs, th, od)
            U_re = jax.lax.stop_gradient(U_re)
            U_im = jax.lax.stop_gradient(U_im)

            def r_of_U(Ur, Ui):
                return resid(core.readout_ui(Ur, Ui, od), ref)

            # r_of_U is per-frequency diagonal (row i depends only on
            # U[i]), so ONE pullback at the all-ones cotangent returns
            # every row gradient G_i = dr_i/dU_i at once.
            r, pb = jax.vjp(r_of_U, U_re, U_im)
            G_re, G_im = pb(jnp.ones_like(r))
            Y_re, Y_im = core.sweep_adj(
                freqs, th, od,
                G_re.astype(jnp.float64), G_im.astype(jnp.float64))
            Y_re = jax.lax.stop_gradient(Y_re)
            Y_im = jax.lax.stop_gradient(Y_im)

            def psi(p):
                R_re, R_im = core.apply_res(freqs, p * scaling, od,
                                            U_re, U_im)
                return jnp.sum(Y_re * R_re + Y_im * R_im, axis=-1)

            # dr_i = -y_i . d(A_i U_i - b_i): p jacfwd tangents through
            # scatter passes and coefficient chains, zero solves
            J = -jax.jacfwd(psi)(params)
            return r, J

        if jac_mode == "adjoint":
            self._rj = jax.jit(rj_adjoint)
        else:
            self._rj = jax.jit(rj if freq_chunk is None else rj_chunked)

        # host-level call segmentation (see Problem._call_segment): the
        # residual rows are per-frequency, so r and J concatenate across
        # separate device calls; padded rows are sliced off, and for the
        # 'complex' kind the per-segment [re, im] halves are regrouped
        # into the global [re(all), im(all)] layout.
        self._segments = None
        F = int(self._freqs.shape[0])
        if call_seg is not None and F > call_seg:
            n_seg = -(-F // call_seg)
            pad = n_seg * call_seg - F
            fpad = jnp.concatenate(
                [self._freqs, jnp.repeat(self._freqs[-1:], pad)])
            rpad = jnp.concatenate(
                [self._ref, jnp.repeat(self._ref[-1:], pad, axis=0)])
            eff = [call_seg] * (n_seg - 1) + [call_seg - pad]
            self._segments = (fpad.reshape(n_seg, call_seg),
                              rpad.reshape(n_seg, call_seg, 2), eff, call_seg)

    def _seg_collect(self, fn, params):
        fseg, rseg, eff, seg = self._segments
        res, ims, Jre, Jim = [], [], [], []
        for i in range(fseg.shape[0]):
            out = fn(params, self._opdata, fseg[i], rseg[i])
            r, J = out if isinstance(out, tuple) else (out, None)
            if self.kind == "complex":
                res.append(r[:eff[i]])
                ims.append(r[seg:seg + eff[i]])
                if J is not None:
                    Jre.append(J[:eff[i]])
                    Jim.append(J[seg:seg + eff[i]])
            else:
                res.append(r[:eff[i]])
                if J is not None:
                    Jre.append(J[:eff[i]])
        r_all = jnp.concatenate(res + ims)
        if not Jre:
            return r_all
        return r_all, jnp.concatenate(Jre + Jim)

    def __call__(self, params):
        if self._segments is not None:
            return self._seg_collect(
                lambda *a: (self._r(*a), None), params)
        return self._r(params, self._opdata, self._freqs, self._ref)

    def value_and_jac(self, params):
        if self._segments is not None:
            return self._seg_collect(self._rj, params)
        return self._rj(params, self._opdata, self._freqs, self._ref)


class Problem:
    """Holds geometry/material/sensor data, the assembled FEM operators and
    produces differentiable jit'd functions."""

    def __init__(
        self,
        geometry: Geometry = None,
        material: Material = None,
        accel: Accelerometer = None,
        ref_fr: tuple[np.ndarray, np.ndarray] = None,
        *,
        cpu: int | None = 0,            # accepted for reference API parity; unused
        spath: str | os.PathLike = None,
        engine: str | None = None,      # 'modal' | 'direct' | 'mixed' | None
        chunk: int = 16,                # direct-engine frequency chunk
        n_modes: int | None = None,     # optional modal truncation
        f_max: float = 600.0,           # band edge for the mixed engine [Hz]
        n_refine: int = 16,             # mixed-engine TOTAL Krylov budget
                                        # (spent as restarted cycles,
                                        # ops/mixed.py).  Tuned on-chip at
                                        # the bench tier: 16 = 2x8 cycles,
                                        # 3647 solves/s at 8.6e-8 nominal /
                                        # 1.6e-6 perturbed-theta accuracy;
                                        # 20 = 3 cycles trades ~40% speed
                                        # for 4e-7 perturbed-theta accuracy
        k_cycle: int | None = None,     # mixed-engine FGMRES cycle length
                                        # (None = tier default); small
                                        # cycles keep the basis tensors and
                                        # the compiled graph small, f64
                                        # restarts supply the depth
        basis_f32: bool | None = None,  # mixed-engine Krylov basis storage
                                        # (None = tier default: f32 MXU
                                        # orthogonalization on the dense-
                                        # precond tier, f64 on the mg tier)
        refine_tol: float = 3e-7,       # mixed-engine residual target; the
                                        # resonance-amplification scaling in
                                        # ops/mixed.py makes this track the
                                        # delivered FRF accuracy ~1:1
        precond: str = "auto",          # mixed-engine complement precond:
                                        # 'dense' (f32 inverse, <=20k DOF) or
                                        # 'mg' (O(nnz) multilevel V-cycle)
        mg_coarse_max: int = 11500,     # mg: coarsen until n_free <= this,
                                        # then invert the coarsest densely
                                        # ON DEVICE.  The default makes the
                                        # 100k-DOF tier a TWO-GRID scheme
                                        # (fine smoothing + one ~11k exact
                                        # coarse inverse): the exact coarse
                                        # solve buys far more GMRES
                                        # contraction than deeper recursion,
                                        # and ~11k is the largest f32 LU the
                                        # TPU's VMEM panel limit allows in
                                        # one shot (fails at ~16k+)
        freq_chunk: int | None = None,  # mixed engine: solve the sweep in
                                        # frequency chunks of this size
                                        # (None = auto from the pattern size)
        operator_layout: str = "auto",  # mixed engine operator application:
                                        # 'flat' (scatter SpMV), 'band' (RCM
                                        # block-tridiagonal MXU matmuls), or
                                        # 'auto' (band above ~8k DOF)
        basis: str = "arpack",          # mixed-engine band-basis builder:
                                        # 'arpack' (host shift-invert, needs
                                        # one f64 splu) or 'lobpcg' (device
                                        # LOBPCG reusing the complement
                                        # preconditioner — factorization-
                                        # free, ops/lobpcg.py)
        ozaki: bool | str = "auto",     # band-tier exact-integer limb
                                        # apply (ops/ozaki.py): the Krylov
                                        # operator runs as int8 MXU GEMMs
                                        # instead of the emulated f64 band
                                        # GEMM.  'auto' = on for
                                        # accelerator backends, off on CPU
                                        # (whose f64 GEMM is a real dot)
    ):
        if (geometry, accel, material, spath) == (None,) * 4:
            raise ValueError("Cannot create a Problem object without arguments.")

        self.n_cpu = cpu
        self.engine = engine
        self.chunk = chunk
        self.n_modes = n_modes
        self.f_max = f_max
        self.n_refine = n_refine
        self.k_cycle = k_cycle
        self.basis_f32 = basis_f32
        self.refine_tol = float(refine_tol)
        if precond not in ("auto", "dense", "mg"):
            raise ValueError(
                f"Unknown precond {precond!r}; valid options: 'auto', "
                "'dense', 'mg'."
            )
        self.precond = precond
        self.mg_coarse_max = int(mg_coarse_max)
        self.freq_chunk = freq_chunk
        if operator_layout not in ("auto", "flat", "band"):
            raise ValueError(
                f"Unknown operator_layout {operator_layout!r}; valid "
                "options: 'auto', 'flat', 'band'."
            )
        self.operator_layout = operator_layout
        if basis not in ("arpack", "lobpcg"):
            raise ValueError(
                f"Unknown basis {basis!r}; valid options: 'arpack', 'lobpcg'."
            )
        self.basis = basis
        if ozaki not in ("auto", True, False):
            raise ValueError(
                f"Unknown ozaki {ozaki!r}; valid options: 'auto', True, "
                "False.")
        self.ozaki = ozaki
        self.precision = default_precision()

        self.accelerometer = accel
        self.material = material
        self.geometry = geometry

        if spath is None:
            if None in (geometry, material):
                raise ValueError(
                    "Cannot create a Problem object without `spath` argument "
                    "if any of `geometry`, `material` arguments is `None`."
                )
        else:
            self._load_setup(spath, geometry, material, accel)

        if self.material.has_params:
            self.parameters = self.material.get_parameters()
        else:
            warnings.warn(
                "Some elastic moduli of a material were not provided, solving "
                "forward problem as standalone will not be possible.",
                RuntimeWarning,
            )

        if ref_fr is not None:
            self.reference_fr = ref_fr

        self.e = self.geometry.height / 2.0
        self.rho = self.material.density
        h = self.geometry.height

        mesh = self.geometry.get_mesh()
        self.mesh = mesh

        have_accel_disk = (
            self.geometry.accel_x is not None
            and self.geometry.accel_y is not None
            and self.geometry.accel_r is not None
        )
        indicator = (
            accel_indicator(self.geometry.accel_x, self.geometry.accel_y,
                            self.geometry.accel_r)
            if have_accel_disk
            else None
        )

        # Inertia constants (physical form; the reference solves the same
        # system scaled by 1/h — Problem.py:421-424 vs 269-271):
        self.I0 = h * self.rho
        self.I2 = self.rho * h**3 / 12.0
        if self.accelerometer is not None:
            # accelerometer smeared as an added layer of height h_a
            # (Problem.py:361-374)
            rho_corr = (
                self.accelerometer.mass
                / (np.pi * self.accelerometer.radius**2)
                / self.accelerometer.height
            )
            self.I0Corr = self.accelerometer.height * rho_corr
            self.I2Corr = rho_corr / 3.0 * (
                (h / 2.0 + self.accelerometer.height) ** 3 - h**3 / 8.0
            )
        else:
            self.I0Corr = 0.0
            self.I2Corr = 0.0

        self.is_symmetric_path = self.material.is_mps and self.accelerometer is None

        if self.is_symmetric_path:
            op = assemble_symm(
                mesh, self.geometry.test_point, indicator=indicator,
                clamped_labels=getattr(self.geometry, "clamped_labels", (1,)))
            self.op = op
            # Total (regular + rotational) inertia, physical scaling:
            # I0*M + I2*L  ==  rho*(M + e^2/3 L) * h  (Problem.py:269-271)
            self.MInertia = self.I0 * op.M + self.I2 * op.L
            self.fInertia = self.I0 * op.fM + self.I2 * op.fL
            # The reference's symm-path accelerometer correction branch
            # (Problem.py:273-299) is unreachable (requires accel None); the
            # analogous correction here would add I0Corr*MCorr + I2Corr*LCorr.
        else:
            if not have_accel_disk:
                raise ValueError(
                    "The 3-field (unsymmetric) path needs an accelerometer "
                    "disk position on the geometry."
                )
            op = assemble_unsymm(
                mesh,
                (self.geometry.accel_x, self.geometry.accel_y),
                self.geometry.accel_r,
                indicator=indicator,
                clamped_labels=getattr(self.geometry, "clamped_labels", (1,)),
            )
            self.op = op
            self.MInertia = (
                self.I0 * (op.mats["M11"] + op.mats["M22"] + op.mats["M33"])
                + self.I0Corr * (op.mats["M11C"] + op.mats["M22C"] + op.mats["M33C"])
                + self.I2 * op.mats["M33I2"]
                + self.I2Corr * op.mats["M33I2C"]
            )
            self.fInertia = (
                self.I0 * (op.lifts["M11"] + op.lifts["M22"] + op.lifts["M33"])
                + self.I0Corr * (op.lifts["M11C"] + op.lifts["M22C"] + op.lifts["M33C"])
                + self.I2 * op.lifts["M33I2"]
                + self.I2Corr * op.lifts["M33I2C"]
            )

        self.n_free = op.n_free
        self.sparsity = op.pattern.nnz / max(op.n_free, 1) ** 2

    # ------------------------------------------------------------------

    def _load_setup(self, spath, geometry, material, accel):
        """setup.json folder loading (reference Problem.py:103-214)."""
        if not isinstance(spath, (str, os.PathLike)):
            raise TypeError(
                "Argument `spath` should have one of the following types: "
                f"str | os.PathLike, not {type(spath)}."
            )
        if not os.path.isabs(spath):
            spath = os.path.join(get_repo_dir(), "setups", spath)
        if not os.path.exists(spath):
            raise ValueError(f"Path of the setup {spath} does not exist.")
        if not os.path.isdir(spath):
            raise ValueError(f"Selected path {spath} is not a directory.")

        setup_fpath = os.path.join(spath, "setup.json")
        if not os.path.exists(setup_fpath):
            raise FileNotFoundError(
                f"`setup.json` file was not found in setup directory {spath}."
            )
        with open(setup_fpath, "r") as file:
            setup_params = json.load(file)

        if "accelerometer" in setup_params:
            nop = setup_params["accelerometer"]
            if isinstance(nop, str):
                self.accelerometer = Accelerometer(nop)
            elif isinstance(nop, dict):
                self.accelerometer = Accelerometer(AccelerometerParams(**nop))
            else:
                raise TypeError(
                    f"In file {setup_fpath} key `accelerometer` should have a "
                    "value with type `str` or `dict`."
                )

        if "material" in setup_params:
            nop = setup_params["material"]
            if isinstance(nop, (str, dict)):
                self.material = get_material(nop)
            else:
                raise TypeError(
                    f"In file {setup_fpath} key `material` should have a value "
                    "with type `str` or `dict`."
                )

        if material is not None:
            self.material = material
        if accel is not None:
            self.accelerometer = accel
        if geometry is not None:
            self.geometry = geometry
        elif "geometry" in setup_params:
            gdict = dict(setup_params["geometry"])
            # optional mesh-resolution keys (framework extension)
            g_ny = gdict.pop("ny", None)
            g_refine = gdict.pop("refine", 1.0)
            if "template" in gdict:
                templ = gdict.pop("template")
                self.geometry = Geometry(
                    templ, accelerometer=self.accelerometer,
                    params=GeometryParams(**gdict),
                    ny=g_ny, refine=g_refine,
                )
            elif "edp" in gdict or "msh" in gdict:
                gfile = gdict.pop("edp", None) or gdict.pop("msh", None)
                gdict.pop("msh", None)
                if not os.path.isabs(gfile):
                    gfile = os.path.join(spath, gfile)
                if "length" in gdict:
                    self.geometry = Geometry(
                        gfile, accelerometer=self.accelerometer,
                        params=GeometryParams(**gdict),
                    )
                else:
                    self.geometry = Geometry(
                        gfile, accelerometer=self.accelerometer,
                        height=gdict["height"],
                    )
            else:
                raise ValueError(
                    "Cannot create Geometry object, file "
                    f"{setup_fpath} should contain `template`, `edp` or `msh` "
                    "keyword inside `geometry`."
                )

        freq_file = os.path.join(spath, "freqs.npy")
        if os.path.exists(freq_file):
            freqs = np.load(freq_file)
            amp = np.load(os.path.join(spath, "amp.npy"))
            ph_path = os.path.join(spath, "phase.npy")
            phase = np.load(ph_path) if os.path.exists(ph_path) else np.zeros_like(amp)
            self.reference_fr = (freqs, amp * np.exp(1j * phase))

        if None in (self.accelerometer, self.geometry, self.material):
            raise RuntimeError(
                "One of the `geometry`, `accelerometer`, `materials` "
                "attributes was not provided in setup.json nor as an argument."
            )

    # ------------------------------------------------------------------

    def _engine(self) -> str:
        if self.engine is not None:
            return self.engine
        # CPU (f64): the modal engine is exact for scalar-loss materials and
        # one LAPACK eigh per theta is the fastest sweep; per-modulus-loss
        # materials (no single (1+i*beta) factor) use the direct engine.
        # Accelerators (f32 hardware): the mixed engine is the accurate
        # default for ALL materials — its refinement residual uses the true
        # complex stiffness, with the beta projection only as the
        # preconditioner model.  Plain f32 factorizations / eigenbases
        # cannot resolve the resonances (the equilibrated operator keeps the
        # biharmonic ~1e8 spectral spread); 'modal' (block-Jacobi f32) and
        # 'direct' remain fast approximate options via Problem(engine=...).
        if jax.default_backend() == "cpu":
            return "modal" if self.material.scalar_loss_factor else "direct"
        return "mixed"

    def _resolve_engine(self) -> str:
        """Engine getFRCore actually builds: the requested/default engine
        after the frequency-dependent-material fallback (only the direct
        engine re-evaluates the material transform per frequency)."""
        engine = self._engine()
        if engine != "direct" and self._transform_is_freq_dependent():
            return "direct"
        return engine

    def getFRCore(self):
        """Per-instance memo of :meth:`_build_fr_core` (a global
        ``functools.cache`` would pin every Problem's operator pytree for
        process lifetime — multi-problem sessions never release it)."""
        memo = getattr(self, "_fr_core_memo", None)
        if memo is None:
            memo = self._fr_core_memo = self._build_fr_core()
        return memo

    def _build_fr_core(self):
        """(core, opdata): a *pure* jittable ``core(freqs, params, opdata)``
        plus the device-resident operator pytree.

        Every large operator array (sparsity indices, flat matrix stacks,
        lifts, readout rows) travels as a runtime ARGUMENT, never a closure:
        jit closures lower to HLO constants, and constant-index scatters make
        the TPU AOT compiler pathological (measured: the same scatter
        compiles in 2.5 s with argument indices vs. not at all with constant
        indices).  Anything that must outer-jit around the FR computation —
        losses, sharded train steps, the driver's compile check — composes
        with ``core`` and threads ``opdata`` through explicitly.
        """
        prec = self.precision
        rdt, cdt = prec.real, prec.complex
        op = self.op
        n = op.n_free
        engine = self._engine()
        chunk = self.chunk
        n_modes = self.n_modes
        h = self.geometry.height

        # Custom materials may depend on omega (the reference evaluates
        # transform(theta, omega) at every frequency, Problem.py:397-399).
        # Only the direct engine supports that: modal assumes a constant
        # real pencil and mixed builds its operator once per sweep.
        freq_dep = self._transform_is_freq_dependent()
        if freq_dep and engine != "direct":
            warnings.warn(
                f"Material transform is frequency-dependent; engine "
                f"{engine!r} assumes a frequency-constant operator — "
                f"falling back to engine='direct'.",
                RuntimeWarning,
            )
            engine = "direct"

        # Symmetric diagonal equilibration.  The 3-field plate operator mixes
        # membrane (~E*h) and bending (~E*h^3) scales plus the h^-4 stiffness
        # growth of the biharmonic operator: raw condition numbers reach 1e7+
        # and sink f32 solves entirely.  Scaling A -> S A S with
        # S = diag(1/sqrt(K_ii(theta_ref))) is computed once at init from the
        # reference parameters (scale ratios barely move with theta) and
        # applied to the flat data inside the jit — row/col gathers, O(nnz).
        diag_mask = op.pattern.rows == op.pattern.cols
        diag_slots = np.nonzero(diag_mask)[0]
        diag_rows = op.pattern.rows[diag_slots]
        K_ref = self._reference_stiffness_flat()
        dvals = np.zeros(n)
        np.add.at(dvals, diag_rows, np.abs(K_ref[diag_slots]))
        dvals = np.where(dvals > 0, dvals, 1.0)
        scale_vec = 1.0 / np.sqrt(dvals)
        # kept for host-side helpers that map device (equilibrated,
        # possibly RCM-permuted) solution vectors back to physical DOFs
        # (diagnostics.oracle.polish_peaks)
        self._eq_scale = scale_vec

        # fold the equilibration into the static operator data: scaled
        # system solves for u~ = S^-1 u, so lifts scale by S and readout
        # rows absorb the back-scaling — zero cost inside the jit.
        ss = scale_vec[op.pattern.rows] * scale_vec[op.pattern.cols]

        if engine == "mixed":
            return self._mixed_core(K_ref, ss, scale_vec)

        if self.is_symmetric_path:
            transform, tr_consts = _hoist_split_transform(
                self.material.get_D_transform(h),
                len(self.material._get_param_tuple()), dtype=rdt)
            opdata = {
                "rows": jnp.asarray(op.pattern.rows),
                "cols": jnp.asarray(op.pattern.cols),
                "MIn": jnp.asarray(self.MInertia * ss, rdt),
                "fIn": jnp.asarray(self.fInertia * scale_vec, rdt),
                "Ks": jnp.asarray(op.Ks * ss[None, :], rdt),      # (6, nnz)
                "fKs": jnp.asarray(op.fKs * scale_vec[None, :], rdt),
                "c": jnp.asarray(op.interpolation_vector * scale_vec, rdt),
                "c0": jnp.asarray(op.interpolation_value_from_bc, rdt),
                "trc": tr_consts,
            }

            def core(freqs, params, od):
                omegas = (2.0 * jnp.pi * jnp.asarray(freqs)).astype(rdt)
                params = jnp.asarray(params).astype(rdt)
                if freq_dep:
                    D = jax.vmap(
                        lambda om: transform(params, om, *od["trc"]))(
                        omegas).astype(cdt)                       # (F, 6)
                    K_flat = jnp.einsum("fk,kn->fn", D, od["Ks"].astype(cdt))
                    bK = jnp.einsum("fk,kn->fn", D, od["fKs"].astype(cdt))
                else:
                    D = transform(params, omegas[0], *od["trc"]).astype(cdt)
                    K_flat = jnp.einsum("k,kn->n", D, od["Ks"].astype(cdt))
                    bK = jnp.einsum("k,kn->n", D, od["fKs"].astype(cdt))
                B = (jnp.atleast_2d(bK)
                     - (omegas**2)[:, None] * od["fIn"][None, :].astype(cdt))
                U = sweep_solve(K_flat, od["MIn"], B, omegas,
                                od["rows"], od["cols"], n,
                                engine=engine, n_modes=n_modes, chunk=chunk)
                return od["c0"] + U @ od["c"]

        else:
            transform, tr_consts = _hoist_split_transform(
                self.material.get_ABD_transform(h),
                len(self.material._get_param_tuple()), dtype=rdt)
            acc = self.accelerometer
            eff = acc.effective_height * acc.height
            ts = acc.transverse_sensitivity

            # disk-mean readout collapsed to three dot-product rows
            # (Problem.py:454-462 takes means over the disk interpolants)
            def row(name):
                R, r0 = op.readout[name]
                return np.asarray(R.mean(axis=0)), float(r0.mean())

            cu, ou = row("u")
            cv, ov = row("v")
            cw, ow = row("w")
            cwx, owx = row("wx")
            cwy, owy = row("wy")

            opdata = {
                "rows": jnp.asarray(op.pattern.rows),
                "cols": jnp.asarray(op.pattern.cols),
                "MIn": jnp.asarray(self.MInertia * ss, rdt),
                "fIn": jnp.asarray(self.fInertia * scale_vec, rdt),
                # (3, 6, nnz): A/B/D flat stiffness stacks (equilibrated)
                "ABD": jnp.asarray(np.stack([
                    op.mat_stack(["A" + s for s in MODULI_INDICES]),
                    op.mat_stack(["B" + s for s in MODULI_INDICES]),
                    op.mat_stack(["D" + s for s in MODULI_INDICES]),
                ]) * ss[None, None, :], rdt),
                "fABD": jnp.asarray(np.stack([
                    op.lift_stack(["A" + s for s in MODULI_INDICES]),
                    op.lift_stack(["B" + s for s in MODULI_INDICES]),
                    op.lift_stack(["D" + s for s in MODULI_INDICES]),
                ]) * scale_vec[None, None, :], rdt),
                "ru": jnp.asarray((cu - eff * cwx) * scale_vec, rdt),
                "rv": jnp.asarray((cv - eff * cwy) * scale_vec, rdt),
                "rw": jnp.asarray(cw * scale_vec, rdt),
                "r0": jnp.asarray([ou - eff * owx, ov - eff * owy, ow], rdt),
                "trc": tr_consts,
            }

            def core(freqs, params, od):
                omegas = (2.0 * jnp.pi * jnp.asarray(freqs)).astype(rdt)
                params = jnp.asarray(params).astype(rdt)
                if freq_dep:
                    def _c(om):
                        Av, Bv, Dv = transform(params, om, *od["trc"])
                        return jnp.stack([Av, Bv, Dv])
                    coeffs = jax.vmap(_c)(omegas).astype(cdt)     # (F, 3, 6)
                    K_flat = jnp.einsum("fmk,mkn->fn", coeffs,
                                        od["ABD"].astype(cdt))
                    bK = jnp.einsum("fmk,mkn->fn", coeffs,
                                    od["fABD"].astype(cdt))
                else:
                    Av, Bv, Dv = transform(params, omegas[0], *od["trc"])
                    coeffs = jnp.stack([Av, Bv, Dv]).astype(cdt)  # (3, 6)
                    K_flat = jnp.einsum("mk,mkn->n", coeffs,
                                        od["ABD"].astype(cdt))
                    bK = jnp.einsum("mk,mkn->n", coeffs,
                                    od["fABD"].astype(cdt))
                B = (jnp.atleast_2d(bK)
                     - (omegas**2)[:, None] * od["fIn"][None, :].astype(cdt))
                U = sweep_solve(K_flat, od["MIn"], B, omegas,
                                od["rows"], od["cols"], n,
                                engine=engine, n_modes=n_modes, chunk=chunk)

                u = U @ od["ru"] + od["r0"][0]
                v = U @ od["rv"] + od["r0"][1]
                w = U @ od["rw"] + od["r0"][2]

                u_abs = jnp.abs(u) * ts
                v_abs = jnp.abs(v) * ts
                w_abs = jnp.abs(w)
                return jnp.sqrt(u_abs**2 + v_abs**2 + w_abs**2)

        return core, opdata

    def _mixed_core(self, K_ref: np.ndarray, ss: np.ndarray,
                    scale_vec: np.ndarray):
        """Core + opdata for the mixed-precision engine (f64 operator data,
        split-complex solves — see ops.mixed).  Static band basis and f32
        preconditioner are built on the host from the equilibrated
        reference-theta operator."""
        from ..ops.mixed import (
            band_basis_host, mixed_apply, mixed_sweep,
            static_preconditioner_host,
        )

        prec = self.precision
        rdt, cdt = prec.real, prec.complex
        op = self.op
        n = op.n_free
        h = self.geometry.height
        n_refine = self.n_refine

        # Frequency chunking bounds the (F, nnz) SpMV intermediates of the
        # sweep (and keeps the AOT jacfwd compile tractable at >12k DOF).
        # Auto policy: ~4 GB of live f64 contributions assuming a few
        # buffers in flight; no chunking for small patterns.
        # scalar-loss materials have K_im = beta*K_re exactly: the sweep
        # can skip the imaginary-stiffness matvecs
        # (ops.mixed._residual_scalar_loss)
        ki_prop = bool(self.material.scalar_loss_factor)

        freq_chunk = self._auto_freq_chunk()

        def _mg_kwargs(od):
            # reads the _mg_* attributes at trace time (set further down in
            # this method, before the cores are ever traced)
            kw = {}
            if "band_lin" in od and self._band_layout is not None:
                # exact f64 operator application through the RCM block-
                # tridiagonal layout (ops/mixed.py band apply); on
                # accelerator backends the apply runs as exact-integer
                # int8 limb GEMMs (ops/ozaki.py) instead of the emulated
                # f64 band GEMM — 6.8x the apply throughput on chip
                # (.probes/ozaki_band_104k.py)
                use_oz = (self.ozaki if isinstance(self.ozaki, bool)
                          else jax.default_backend() != "cpu")
                kw["band"] = {"layout": self._band_layout,
                              "lin": od["band_lin"],
                              "ozaki": use_oz}
            if "mg_band0" in od:
                return kw | {
                    "mg": {"tg_band0": od["mg_band0"],
                           "dinv": od["mg_dinv"], "Pt": od["mg_Pt"],
                           "Kc_inv": od["mg_Kcinv"],
                           "slots": od["mg_slots"],
                           "lmax": self._mg_lmax, "rl": self._mg_rl,
                           "layout": self._band_layout},
                    "K_ref64": od["Kref64"],
                }
            if "mg_arrays" not in od:
                return kw
            return kw | {
                "mg": {"arrays": od["mg_arrays"],
                       "static": self._mg_static},
                "K_ref64": od["Kref64"],
            }

        def _attach_adjoint_hooks(core, assemble, sweep, readout):
            """Expose the pieces the adjoint-Jacobian needs on the core.

            ResidualFunction (jac_mode='adjoint') builds the Gauss-Newton
            Jacobian of a per-frequency SCALAR residual from 2 batched
            solves — primal + one adjoint (A^T y = dr/dU) — plus p
            solve-free jacfwd passes through the explicit residual map
            A(theta) U - b(theta), instead of (1 + p) implicit-diff JVP
            solves.  This is the same adjoint structure the reference's
            spsolve transpose rule implements (Sparse.py:211-222), lifted
            from gradients to full scalar-readout Jacobians.
            """
            def sweep_adj(freqs, params, od, G_re, G_im):
                K_re, K_im, _, _, omegas = assemble(freqs, params, od)
                return mixed_sweep(
                    K_re, K_im, od["MIn"], G_re, G_im, omegas,
                    od["rows"], od["cols"], n, od["W64"], od["invK32"],
                    n_refine=n_refine, refine_tol=self.refine_tol,
                    freq_chunk=freq_chunk,
                    ki_proportional=ki_prop, K_ref32=od.get("Kref32"),
                    k_cycle=self.k_cycle, basis_f32=self.basis_f32,
                    adjoint=True,
                    **_mg_kwargs(od),
                )

            def apply_res(freqs, params, od, U_re, U_im):
                from ..ops import mixed as _mixed
                K_re, K_im, B_re, B_im, omegas = assemble(freqs, params, od)
                # Chunk the frequency axis of the fused apply: its
                # (S, 2, C, seg) contribution tensors are tiled by XLA
                # with the frequency axis minor (padded to 128) and
                # several stay live under jacfwd remat — the unchunked
                # 64-freq apply at nnz=1.1e6 OOMed a 16 GB chip (46k-tier
                # GN, round 4).  ~100 MB per tensor keeps the whole
                # jacfwd wave under a few GB; assembly stays outside the
                # scan (theta tangents flow through the closed-over
                # K_re/K_im — plain jvp-of-map linearizes exactly).
                seg = min(int(od["rows"].shape[0]), _mixed._RES_SEG)
                S = 2 if ki_prop else 3
                C = max(8, int(_APPLY_BUDGET // (S * 2 * seg * 8)))
                C = 1 << (C.bit_length() - 1)
                F = int(omegas.shape[0])
                if C < F:
                    k = -(-F // C)
                    pad = k * C - F

                    def _chunks(v):
                        if pad:
                            v = jnp.concatenate(
                                [v, jnp.broadcast_to(
                                    v[-1:], (pad,) + v.shape[1:])])
                        return v.reshape((k, C) + v.shape[1:])

                    def one(args):
                        om_c, Urc, Uic = args
                        return mixed_apply(
                            K_re, K_im, od["MIn"], om_c, Urc, Uic,
                            od["rows"], od["cols"], n,
                            ki_proportional=ki_prop)

                    AU_re, AU_im = jax.lax.map(
                        one, (_chunks(omegas), _chunks(U_re), _chunks(U_im)))
                    AU_re = AU_re.reshape(-1, AU_re.shape[-1])[:F]
                    AU_im = AU_im.reshape(-1, AU_im.shape[-1])[:F]
                else:
                    AU_re, AU_im = mixed_apply(
                        K_re, K_im, od["MIn"], omegas, U_re, U_im,
                        od["rows"], od["cols"], n, ki_proportional=ki_prop)
                return AU_re - B_re, AU_im - B_im

            core.sweep_u = sweep
            core.sweep_adj = sweep_adj
            core.apply_res = apply_res
            core.readout_ui = readout

        # RCM block-tridiagonal layout (ops/band.py): relabel the free DOFs
        # once, here, so the whole engine — pattern indices, band basis,
        # readout vectors, MG hierarchy — lives in the reordered space and
        # the hot loop replaces scatter SpMV with MXU batched matmuls.
        # Below ~8k DOF the dense-GEMM preconditioner dominates anyway and
        # the (nb, 3, b, b) block tensor would waste memory on tiny blocks.
        use_band = (self.operator_layout == "band"
                    or (self.operator_layout == "auto" and n >= 8192))
        if use_band:
            from ..ops.band import (
                build_band_layout, flat_to_band, permute_pattern,
                permute_vector,
            )

            layout = build_band_layout(op.pattern.rows, op.pattern.cols, n)
            rows_h, cols_h = permute_pattern(layout, op.pattern.rows,
                                             op.pattern.cols)

            def pvec(v, axis=-1):
                return permute_vector(layout, v, axis=axis)
        else:
            layout = None
            rows_h, cols_h = op.pattern.rows, op.pattern.cols

            def pvec(v, axis=-1):
                return v
        self._band_layout = layout

        K_ref_eq = K_ref * ss
        M_eq = self.MInertia * ss
        om_max = 2.0 * np.pi * self.f_max

        base = {
            "rows": jnp.asarray(rows_h),
            "cols": jnp.asarray(cols_h),
            "MIn": jnp.asarray(M_eq, jnp.float64),
            "fIn": jnp.asarray(pvec(self.fInertia * scale_vec), jnp.float64),
            # "W64" (the band basis) is added AFTER the preconditioner
            # build below: the 'lobpcg' basis builder reuses the complement
            # preconditioner as its T ~= K^-1 (ops/lobpcg.py)
        }
        if layout is not None:
            # the scatter targets ride in opdata (index arrays as closure
            # constants are fatal to the AOT compiler — CLAUDE.md); they
            # serve both the f32 two-grid preconditioner build and the
            # per-theta f64 block tensors of the exact operator
            # (ops/mixed.py band apply: 3.8x the scatter SpMV at n=21k)
            lin_dev = jnp.asarray(layout.lin)
            base["band_lin"] = lin_dev

        # 'auto': the dense f32 inverse is built on device, and the TPU LU
        # panel limit makes single-shot inversion impossible (and the
        # blocked Schur fallback numerically marginal) above ~12k rows —
        # exactly where the O(nnz) two-grid wins anyway
        precond_resolved = self.precond
        if precond_resolved == "auto":
            precond_resolved = "mg" if n > 12288 else "dense"
        if precond_resolved == "mg" and not self.geometry.can_coarsen:
            # the mg hierarchy regenerates coarser meshes; .msh imports and
            # injected meshes cannot.  Auto falls back to the dense
            # complement preconditioner (works at any n, slower above ~12k);
            # an explicit 'mg' request is a user error worth raising early.
            if self.precond == "mg":
                raise ValueError(
                    "precond='mg' needs a coarsenable geometry (template or "
                    ".edp script); this mesh-imported geometry has none. "
                    "Use precond='dense'."
                )
            warnings.warn(
                f"n_free={n} would use the mg preconditioner, but this "
                "mesh-imported geometry cannot be coarsened; falling back "
                "to the dense complement preconditioner (slower above "
                "~12k DOF).",
                RuntimeWarning,
            )
            precond_resolved = "dense"
        self._precond_resolved = precond_resolved

        if precond_resolved == "mg":
            # O(nnz) multilevel complement preconditioner (100k-DOF path):
            # recursive Galerkin correction through FE-basis prolongations,
            # scale-consistent with the equilibration (ops/mg.py)
            from ..ops.mg import build_prolongation, build_multilevel_host

            three_field = not self.is_symmetric_path
            chain = []
            fine = self
            # aim the FIRST coarsening directly at the dense-invertible
            # size (n scales ~ factor^-2): one exact coarse level beats a
            # deeper chain of approximate ones, and the preconditioner
            # refinement rounds (ops/mixed) absorb the slightly weaker
            # smoothing of an aggressive coarsening ratio
            factor = max(2.0, float(np.sqrt(n / (0.62 * self.mg_coarse_max))))
            # always at least one coarse level; recurse until the coarsest
            # is small enough to invert densely
            while ((not chain or fine.n_free > self.mg_coarse_max)
                   and len(chain) < 8):
                cp = Problem(
                    self.geometry.coarsened(factor), self.material,
                    self.accelerometer, engine="direct",
                )
                if cp.n_free >= fine.n_free or cp.n_free < 60:
                    break
                chain.append(cp)
                fine = cp
                factor *= 2.0
                if layout is not None:
                    break  # the band two-grid uses exactly one coarse level
            if not chain:
                raise ValueError(
                    "precond='mg' could not build a coarser mesh level for "
                    f"this geometry (n_free={n}); use precond='dense'."
                )

            Ps = []
            fine = self
            for cp in chain:
                Ps.append(build_prolongation(
                    fine.mesh, cp.mesh, fine.op.free_idx, cp.op.free_idx,
                    fine.op.constrained, cp.op.constrained,
                    three_field=three_field,
                ))
                fine = cp
            from ..ops.dense import inv_refined
            from ..ops.scatter import to_dense as _to_dense

            base |= {
                "invK32": jnp.zeros((1, 1), jnp.float32),  # unused dummy
                "Kref64": jnp.asarray(K_ref_eq, jnp.float64),
            }
            if layout is not None:
                # ---- band tier: scatter-free symmetric two-grid --------
                # fine smoothing on the f32 band operator, one EXACT
                # coarse solve through a rectangular block-band
                # prolongation (induced coarse ordering) and a
                # device-inverted dense coarse operator
                import scipy.sparse as sp

                from ..ops.band import build_rect_band, rect_band_tensor
                from ..ops.mg import _dinv_lmax, _pin_dead

                P = Ps[0][layout.perm, :].tocsr()
                P = (sp.diags(1.0 / pvec(scale_vec)) @ P).tocsr()
                rl = build_rect_band(P, layout)
                Ksp = sp.csr_matrix((K_ref_eq, (rows_h, cols_h)),
                                    shape=(n, n))
                Ksp = 0.5 * (Ksp + Ksp.T)
                Pp = P[:, rl.perm_c]
                Kc = _pin_dead((Pp.T @ (Ksp @ Pp)).tocsc(), Pp)
                Kc = (0.5 * (Kc + Kc.T)).tocsc()
                dinv, lmax = _dinv_lmax(Ksp)
                # the coarse Galerkin operator inherits the equilibrated
                # variables through P~ = S^-1 P and is too ill-conditioned
                # for ANY f32 factorization (diag spread ~1e7 after its own
                # Jacobi scaling — a device f32 LU inverse came out with
                # O(1) error and Newton-Schulz diverged from it).  At
                # n_c <= ~8.6k the host f64 splu inverse is cheap and its
                # ~0.3 GB f32 transfer is the one worthwhile use of the
                # slow transport.
                import scipy.sparse.linalg as spla

                Kc_inv = spla.splu(Kc).solve(np.eye(Kc.shape[0]))
                base |= {
                    "mg_band0": flat_to_band(
                        jnp.asarray(K_ref_eq, jnp.float32), layout,
                        lin_dev),
                    "mg_dinv": jnp.asarray(dinv, jnp.float32),
                    "mg_Pt": rect_band_tensor(rl),
                    "mg_slots": jnp.asarray(rl.slots),
                    "mg_Kcinv": jnp.asarray(Kc_inv, jnp.float32),
                }
                self._mg_lmax = lmax
                self._mg_rl = rl
                self._mg_Kc = Kc  # host COO — diagnostics/tests
            else:
                # flat tier: recursive Galerkin multilevel with a
                # device-inverted coarsest level
                mg_arrays, mg_static = build_multilevel_host(
                    K_ref_eq, rows_h, cols_h, n, Ps,
                    row_scale=pvec(scale_vec), invert_coarse=False,
                )
                Kc = mg_arrays.pop("Kc_coo")
                nc = int(Kc["n"])
                # one jitted program: XLA plans the liveness of the
                # blocked inversion's GB-scale intermediates instead of
                # the eager dispatcher keeping every one alive
                inv_fn = jax.jit(
                    lambda d, r, c: inv_refined(_to_dense(d, r, c, nc)))
                mg_arrays["Kc_inv32"] = inv_fn(
                    jnp.asarray(Kc["data"], jnp.float32),
                    jnp.asarray(Kc["rows"]), jnp.asarray(Kc["cols"]))
                base["mg_arrays"] = jax.tree_util.tree_map(
                    jnp.asarray, mg_arrays)
                self._mg_static = mg_static
        else:
            # dense inverse computed ON DEVICE (f32 LU): skips both the
            # host O(n^3) build and the n^2 transfer through the tunneled
            # transport; quality difference vs the host f64 build is
            # O(eps32 * kappa) either way and absorbed by the refinement
            # rounds (ops/mixed.precond)
            from ..ops.dense import inv_refined
            from ..ops.scatter import to_dense as _to_dense

            Kref32 = jnp.asarray(K_ref_eq, jnp.float32)
            inv_fn = jax.jit(
                lambda d, r, c: inv_refined(_to_dense(d, r, c, n)))
            base["invK32"] = inv_fn(Kref32, jnp.asarray(rows_h),
                                    jnp.asarray(cols_h))
            base["Kref32"] = Kref32

        # ---- band basis (theta-independent, init-time) -------------------
        # 'arpack': host shift-invert (one f64 splu — fine to ~100k but the
        # last factorization in the pipeline).  'lobpcg': device LOBPCG
        # reusing the complement preconditioner built above as T ~= K^-1 —
        # factorization-free, the panel work runs on the accelerator
        # (ops/lobpcg.py).
        basis_resolved = self.basis
        if basis_resolved == "lobpcg":
            if precond_resolved == "mg" and layout is not None:
                basis_precond = {
                    "kind": "twogrid", "band0": base["mg_band0"],
                    "dinv": base["mg_dinv"], "Pt": base["mg_Pt"],
                    "Kc_inv": base["mg_Kcinv"], "slots": base["mg_slots"],
                    "lmax": self._mg_lmax, "layout": layout,
                    "rl": self._mg_rl, "refine": 8,
                }
            elif precond_resolved == "dense":
                basis_precond = {
                    "kind": "dense", "invK32": base["invK32"], "refine": 8,
                }
            else:
                warnings.warn(
                    "basis='lobpcg' is not wired for the flat multilevel "
                    "preconditioner tier; falling back to the ARPACK host "
                    "basis.", RuntimeWarning)
                basis_resolved = "arpack"
        if basis_resolved == "lobpcg":
            from ..ops.lobpcg import band_basis_lobpcg

            W64, _ = band_basis_lobpcg(
                K_ref_eq, M_eq, rows_h, cols_h, n, omega_max=om_max,
                precond=basis_precond, band_layout=layout,
                band_lin=base.get("band_lin"),
            )
        else:
            W64, _ = band_basis_host(
                K_ref_eq, M_eq, rows_h, cols_h, n,
                omega_max=om_max,
            )
        base["W64"] = jnp.asarray(W64, jnp.float64)

        if self.is_symmetric_path:
            # split (re, im) transform evaluated at f64 theta: the f32/c64
            # coefficient path floors FRF accuracy at ~5e-6 near resonance
            # peaks (coefficient rounding amplified by the resonance Q),
            # independent of solver tolerance
            transform, tr_consts = _hoist_split_transform(
                self.material.get_D_transform_split(h),
                len(self.material._get_param_tuple()))
            opdata = base | {
                "Ks": jnp.asarray(op.Ks * ss[None, :], jnp.float64),
                "fKs": jnp.asarray(pvec(op.fKs * scale_vec[None, :]),
                                   jnp.float64),
                "c": jnp.asarray(pvec(op.interpolation_vector * scale_vec),
                                 jnp.float64),
                "c0": jnp.asarray(op.interpolation_value_from_bc, jnp.float64),
                "trc": tr_consts,
            }

            def _assemble(freqs, params, od):
                omegas = (2.0 * jnp.pi * jnp.asarray(freqs)).astype(jnp.float64)
                params = jnp.asarray(params).astype(jnp.float64)
                Dre, Dim = transform(params, omegas[0], *od["trc"])
                Dre = Dre.astype(jnp.float64)
                Dim = Dim.astype(jnp.float64)
                K_re = jnp.einsum("k,kn->n", Dre, od["Ks"])
                K_im = jnp.einsum("k,kn->n", Dim, od["Ks"])
                bK_re = jnp.einsum("k,kn->n", Dre, od["fKs"])
                bK_im = jnp.einsum("k,kn->n", Dim, od["fKs"])
                om2 = (omegas**2)[:, None]
                B_re = bK_re[None, :] - om2 * od["fIn"][None, :]
                B_im = jnp.broadcast_to(bK_im[None, :], B_re.shape)
                return K_re, K_im, B_re, B_im, omegas

            def _sweep(freqs, params, od, diagnostics=False):
                K_re, K_im, B_re, B_im, omegas = _assemble(freqs, params, od)
                return mixed_sweep(
                    K_re, K_im, od["MIn"], B_re, B_im, omegas,
                    od["rows"], od["cols"], n, od["W64"], od["invK32"],
                    n_refine=n_refine, refine_tol=self.refine_tol,
                    freq_chunk=freq_chunk,
                    ki_proportional=ki_prop, K_ref32=od.get("Kref32"),
                    k_cycle=self.k_cycle, basis_f32=self.basis_f32,
                    diagnostics=diagnostics,
                    **_mg_kwargs(od),
                )

            def _readout(U_re, U_im, od):
                y_re = od["c0"] + U_re @ od["c"]
                y_im = U_im @ od["c"]
                return (y_re + 1j * y_im).astype(cdt)

            def core(freqs, params, od):
                U_re, U_im = _sweep(freqs, params, od)
                return _readout(U_re, U_im, od)

            def core_diag(freqs, params, od):
                U_re, U_im, rn, rn_fin, rn0, tol = _sweep(
                    freqs, params, od, diagnostics=True)
                return _readout(U_re, U_im, od), rn, rn_fin, rn0, tol

            core.diag = core_diag
            _attach_adjoint_hooks(core, _assemble, _sweep, _readout)
            return core, opdata

        # ---- 3-field path --------------------------------------------------
        # split (re, im) transform at f64 theta — see the symmetric path note
        transform, tr_consts = _hoist_split_transform(
            self.material.get_ABD_transform_split(h),
            len(self.material._get_param_tuple()))
        acc = self.accelerometer
        eff = acc.effective_height * acc.height
        ts = acc.transverse_sensitivity

        def row(name):
            R, r0 = op.readout[name]
            return np.asarray(R.mean(axis=0)), float(r0.mean())

        cu, ou = row("u")
        cv, ov = row("v")
        cw, ow = row("w")
        cwx, owx = row("wx")
        cwy, owy = row("wy")

        opdata = base | {
            "ABD": jnp.asarray(np.stack([
                op.mat_stack(["A" + s for s in MODULI_INDICES]),
                op.mat_stack(["B" + s for s in MODULI_INDICES]),
                op.mat_stack(["D" + s for s in MODULI_INDICES]),
            ]) * ss[None, None, :], jnp.float64),
            "fABD": jnp.asarray(pvec(np.stack([
                op.lift_stack(["A" + s for s in MODULI_INDICES]),
                op.lift_stack(["B" + s for s in MODULI_INDICES]),
                op.lift_stack(["D" + s for s in MODULI_INDICES]),
            ]) * scale_vec[None, None, :]), jnp.float64),
            "ru": jnp.asarray(pvec((cu - eff * cwx) * scale_vec), jnp.float64),
            "rv": jnp.asarray(pvec((cv - eff * cwy) * scale_vec), jnp.float64),
            "rw": jnp.asarray(pvec(cw * scale_vec), jnp.float64),
            "r0": jnp.asarray([ou - eff * owx, ov - eff * owy, ow], jnp.float64),
            "trc": tr_consts,
        }

        def _assemble3(freqs, params, od):
            omegas = (2.0 * jnp.pi * jnp.asarray(freqs)).astype(jnp.float64)
            params = jnp.asarray(params).astype(jnp.float64)
            (Are, Aim), (Bre, Bim), (Dre, Dim) = transform(
                params, omegas[0], *od["trc"])
            Cre = jnp.stack([Are, Bre, Dre]).astype(jnp.float64)  # (3, 6)
            Cim = jnp.stack([Aim, Bim, Dim]).astype(jnp.float64)
            K_re = jnp.einsum("mk,mkn->n", Cre, od["ABD"])
            K_im = jnp.einsum("mk,mkn->n", Cim, od["ABD"])
            bK_re = jnp.einsum("mk,mkn->n", Cre, od["fABD"])
            bK_im = jnp.einsum("mk,mkn->n", Cim, od["fABD"])
            om2 = (omegas**2)[:, None]
            B_re = bK_re[None, :] - om2 * od["fIn"][None, :]
            B_im = jnp.broadcast_to(bK_im[None, :], B_re.shape)
            return K_re, K_im, B_re, B_im, omegas

        def _sweep3(freqs, params, od, diagnostics=False):
            K_re, K_im, B_re, B_im, omegas = _assemble3(freqs, params, od)
            return mixed_sweep(
                K_re, K_im, od["MIn"], B_re, B_im, omegas,
                od["rows"], od["cols"], n, od["W64"], od["invK32"],
                n_refine=n_refine, refine_tol=self.refine_tol,
                freq_chunk=freq_chunk,
                ki_proportional=ki_prop, K_ref32=od.get("Kref32"),
                k_cycle=self.k_cycle, basis_f32=self.basis_f32,
                diagnostics=diagnostics,
                **_mg_kwargs(od),
            )

        def _readout3(U_re, U_im, od):
            def mag2(rvec, r0):
                yr = U_re @ rvec + r0
                yi = U_im @ rvec
                return yr * yr + yi * yi

            u2 = mag2(od["ru"], od["r0"][0])
            v2 = mag2(od["rv"], od["r0"][1])
            w2 = mag2(od["rw"], od["r0"][2])
            return jnp.sqrt(ts * ts * (u2 + v2) + w2).astype(rdt)

        def core(freqs, params, od):
            U_re, U_im = _sweep3(freqs, params, od)
            return _readout3(U_re, U_im, od)

        def core_diag(freqs, params, od):
            U_re, U_im, rn, rn_fin, rn0, tol = _sweep3(
                freqs, params, od, diagnostics=True)
            return _readout3(U_re, U_im, od), rn, rn_fin, rn0, tol

        core.diag = core_diag
        _attach_adjoint_hooks(core, _assemble3, _sweep3, _readout3)
        return core, opdata

    def _transform_is_freq_dependent(self) -> bool:
        """Host probe: does the material transform depend on omega?  The
        built-in families are omega-independent; custom materials may not be
        (reference Problem.py:397-399 evaluates transform(theta, omega) at
        every frequency).  Without known parameters the probe is skipped and
        the transform is assumed independent."""
        memo = getattr(self, "_freq_dep_memo", None)
        if memo is not None:
            return memo
        theta = getattr(self, "parameters", None)
        if theta is None:
            return False
        theta = np.asarray(theta, np.float64)
        h = self.geometry.height
        tr = (self.material.get_D_transform(h) if self.is_symmetric_path
              else self.material.get_ABD_transform(h))
        # probe on the host CPU: f64 theta promotes to complex128 inside the
        # transforms, which the TPU backend rejects even for eager scalars
        with jax.default_device(jax.devices("cpu")[0]):
            a = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, tr(theta, 0.0)))
            b = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, tr(theta, 1234.5)))
        self._freq_dep_memo = not all(
            np.allclose(x, y, rtol=1e-12, atol=0.0, equal_nan=True)
            for x, y in zip(a, b)
        )
        return self._freq_dep_memo

    def _reference_stiffness_flat(self) -> np.ndarray:
        """Flat (signed) Re K(theta_ref) data: equilibration scale source and
        the reference operator for the mixed engine's band basis."""
        op = self.op
        if getattr(self, "parameters", None) is None:
            if self.is_symmetric_path:
                return op.Ks.sum(axis=0)
            return sum(v for k, v in op.mats.items() if k[0] in "ABD")
        theta = np.asarray(self.parameters, np.float64)
        h = self.geometry.height
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu0 = None
        with jax.default_device(cpu0):
            if self.is_symmetric_path:
                D = np.asarray(self.material.get_D_transform(h)(theta, 0.0))
                return np.einsum("k,kn->n", D.real, op.Ks)
            Av, Bv, Dv = (
                np.asarray(x)
                for x in self.material.get_ABD_transform(h)(theta, 0.0)
            )
        out = np.zeros(op.pattern.nnz)
        for i, s in enumerate(MODULI_INDICES):
            out += (
                Av[i].real * op.mats["A" + s]
                + Bv[i].real * op.mats["B" + s]
                + Dv[i].real * op.mats["D" + s]
            )
        return out

    def getFRFunction(self) -> Callable:
        """(freqs, params) -> frequency response, jit-compiled.

        Symmetric path returns the complex amplitude at the test point
        (Problem.py:391-417); the 3-field path returns the real accelerometer
        magnitude response (Problem.py:432-495).  The returned callable
        exposes ``.core`` and ``.opdata`` for composition (losses, sharding,
        the driver entry) without re-capturing operator arrays as constants.
        """
        memo = getattr(self, "_fr_fn_memo", None)
        if memo is not None:
            return memo

        core, opdata = self.getFRCore()
        jitted = jax.jit(core)
        seg = self._call_segment()

        def fn(freqs, params):
            freqs = np.asarray(freqs)
            F = freqs.shape[0]
            if seg is None or F <= seg:
                return jitted(freqs, params, opdata)
            # host-level segmentation: one device call per <= seg
            # frequencies (the tunneled TPU runtime kills executions
            # running longer than ~a minute, and a 100k-DOF 512-pt sweep
            # is several).  The last segment is padded to keep one
            # compiled shape.
            outs = []
            for lo in range(0, F, seg):
                fs = freqs[lo:lo + seg]
                pad = seg - fs.shape[0]
                if pad:
                    fs = np.concatenate([fs, np.repeat(fs[-1:], pad)])
                y = jitted(jnp.asarray(fs), params, opdata)
                outs.append(y[:y.shape[0] - pad] if pad else y)
            return jnp.concatenate(outs, axis=0)

        fn.core = core
        fn.opdata = opdata
        self._fr_fn_memo = fn
        return fn

    def _auto_freq_chunk(self, lanes: int = 1) -> int | None:
        """Mixed-engine frequency chunk bounding live FGMRES state to ~2 GB.

        Per-chunk memory is dominated by the f64 Krylov V/Z bases; every
        hot op at the big-pattern tier is LATENCY-bound, not batch-bound
        (the f64 scatter costs 206 ms at nnz=2e6 whether 16 or 128 lanes
        ride along), so the chunk should be as LARGE as memory allows.
        ``lanes`` counts concurrent solves per frequency point: 1 for a
        plain sweep, (1 + n_params) for a fused residual+jacfwd call —
        each JVP tangent runs its own implicit-diff solve alongside the
        primal, so the Jacobian path must shrink the chunk accordingly
        (unchunked r+J at n=32k OOMs a 16 GB chip).  None = chunking is
        pure overhead (small pattern or explicit user override)."""
        if self.freq_chunk is not None:
            return self.freq_chunk
        if self.op.pattern.nnz <= 300_000:
            return None
        per_lane = (4.0 * self.n_refine + 6.0) * self.n_free * 8.0 * lanes
        # floor of 8: vmapped chunks below 8 lanes hit a broken XLA:TPU
        # small-batch codegen path (NaN at resonance lanes — see the
        # min-lane padding note in ops/mixed.mixed_sweep)
        return int(np.clip(
            2 ** np.floor(np.log2(max(2.0e9 / per_lane, 8.0))), 8, 64))

    def _call_segment(self, jac: bool = False,
                      adjoint: bool = False) -> int | None:
        """Max frequencies per device call (None = unsegmented).

        Big-DOF sweeps must be split across device executions: the axon
        TPU runtime kills single executions beyond roughly a minute, and
        frequency points are embarrassingly independent anyway.  A jacfwd
        residual+Jacobian call does ~(1 + n_params) sweeps of work
        (forward + one JVP per parameter), so gradient/Jacobian paths
        (``jac=True``) segment from a ~4x smaller DOF count (measured:
        the n=21k r+J at 512 points exceeds the runtime's kill window
        while the forward sweep alone takes 12.6 s).  The ADJOINT
        Jacobian (``adjoint=True``) does ~2.6 sweeps of work per
        frequency regardless of the parameter count, so its segments
        stay at the sweep size instead of shrinking at 60k DOF."""
        if jax.default_backend() == "cpu":
            return None
        n = self.n_free
        if n < (8_000 if jac else 30_000):
            return None
        # the jacfwd r+J call does (1 + n_params) sweeps of work per
        # frequency; at ~100k DOF a 64-frequency Jacobian call brushes
        # the runtime's kill window (measured 143 s / 512 pts at n=32k ->
        # ~2.3 s per 8-freq chunk scales to ~40-80 s per 64-freq call at
        # 100k)
        return 32 if (jac and not adjoint and n >= 60_000) else 64

    # ------------------------------------------------------------------

    def _check_band(self, freqs) -> None:
        """Warn when the sweep leaves the mixed engine's preconditioned band."""
        if self._resolve_engine() == "mixed":
            fmax = float(np.max(np.asarray(freqs)))
            if fmax > self.f_max * 1.0001:
                warnings.warn(
                    f"Sweep reaches {fmax:.1f} Hz but the mixed engine's band "
                    f"basis was built for f_max={self.f_max:.1f} Hz; accuracy "
                    "and refinement convergence degrade above the band. "
                    "Recreate the Problem with f_max >= the sweep maximum.",
                    RuntimeWarning,
                )

    def diagnoseSweep(self, freqs, params: np.ndarray = None) -> dict:
        """Per-frequency convergence signal of the mixed engine's sweep.

        The FGMRES iteration caps bound any stagnation silently (the solve
        returns its best iterate either way); this runs the identical solve
        with its convergence bookkeeping exposed so unconverged frequencies
        are DETECTABLE.  Returns a dict of numpy arrays over the sweep:

        * ``fr`` — the FRF values (same as :meth:`solveForward`),
        * ``residual_norm`` — the Krylov loop's TRUE f64 exit residual
          norm (what the solve's own stopping test compared),
        * ``final_residual_norm`` — the true residual of the returned
          iterate AFTER the final band corrections, which deliberately
          trade residual norm in benign directions for resonance-amplified
          solution error (so this one can sit above the target on
          perfectly converged solves — report it, don't gate on it),
        * ``initial_residual_norm`` — the residual norm of the band-
          resolvent start the iteration began from,
        * ``target`` — the amplification-aware norm target the solve aimed
          for,
        * ``converged`` — the solve either reached its target or reduced
          the post-band-start residual by >= 9 orders of magnitude.  The
          target is amplification-tightened down to the f64 floor at
          resonance lanes (deliberately unreachable — "residuals below
          eps64*||b|| are still productive"), so target-only gating would
          cry wolf on healthy solves; a healthy default-budget solve makes
          11-13 orders of progress (measured), while the failure mode this
          flag exists to catch — preconditioner breakdown / stagnation —
          makes at most ~2.
        """
        if self._resolve_engine() != "mixed":
            raise ValueError(
                "diagnoseSweep applies to the iterative mixed engine; the "
                f"resolved engine here is {self._resolve_engine()!r} "
                "(modal/direct solves are direct factorizations — their "
                "accuracy is not iteration-bounded).")
        if params is None:
            params = self.parameters
        self._check_band(freqs)
        core, od = self.getFRCore()
        jitted = jax.jit(core.diag)
        freqs = np.asarray(freqs)
        params = jnp.asarray(params)
        seg = self._call_segment() or len(freqs)
        outs = []
        for i in range(0, len(freqs), seg):
            outs.append(jax.tree_util.tree_map(
                np.asarray,
                jitted(jnp.asarray(freqs[i:i + seg]), params, od)))
        y, rn, rn_fin, rn0, tol = (np.concatenate([o[k] for o in outs])
                                   for k in range(5))
        return {
            "fr": y,
            "residual_norm": rn,
            "final_residual_norm": rn_fin,
            "initial_residual_norm": rn0,
            "target": tol,
            "converged": (rn <= tol * (1.0 + 1e-12)) | (rn <= 1e-9 * rn0),
        }

    def solveForward(self, freqs: np.ndarray, params: np.ndarray = None,
                     polish_peaks=False) -> np.ndarray:
        """Forward FRF for a set of frequencies (Problem.py:611-639).

        ``polish_peaks``: resonance-grade accuracy at scanned |FRF| peaks on
        the chip — True polishes the global peak, an int k the k largest
        local maxima, a sequence explicit indices.  Each polished point gets
        a host-exact residual correction fed back through the engine
        (diagnostics.oracle.polish_peaks), turning the TPU runtime's
        ~1e-5..1e-4 resonance-peak arithmetic floor (SCALE.md) into ~1e-7
        for one extra small solve batch; off-peak points are already at
        1e-9..1e-7 and are left untouched.
        """
        if params is None:
            params = self.parameters
        params = jnp.array(params)
        self._check_band(freqs)
        fr_func = self.getFRFunction()
        fr = fr_func(jnp.asarray(freqs), params)
        if polish_peaks is False or polish_peaks is None:
            return fr
        from ..diagnostics.oracle import polish_peaks as _polish

        peaks = 1 if polish_peaks is True else polish_peaks
        fr_pol, _ = _polish(self, freqs, fr=fr, params=np.asarray(params),
                            peaks=peaks)
        return fr_pol

    def getSolutionMatrices(self, D, beta):
        """Flat K_real/K_imag/MInertia data (Problem.py:923-930 analog)."""
        if not self.is_symmetric_path:
            raise NotImplementedError("Solution matrices for the 3-field path.")
        loss_moduli = beta * D
        K_real = jnp.einsum("k,kn->n", jnp.asarray(D), jnp.asarray(self.op.Ks))
        K_imag = jnp.einsum("k,kn->n", jnp.asarray(loss_moduli), jnp.asarray(self.op.Ks))
        return K_real, K_imag, jnp.asarray(self.MInertia)

    # ------------------------------------------------------------------

    def getLossFunction(
        self,
        frequencies: jax.Array,
        reference_fr: jax.Array,
        func_type: str,
        scaling_params: jax.Array = None,
    ) -> "LossFunction":
        """Loss factory; types MSE / RMSE / MSE_AFC / MSE_LOG_AFC
        (Problem.py:933-980).

        Returns a :class:`LossFunction` — a plain ``f(params) -> scalar``
        callable that additionally carries pre-jitted ``.grad``,
        ``.value_and_grad``, ``.hessian`` oracles (all threading the operator
        pytree as arguments, see ``getFRCore``).  The optimizers duck-type on
        these, so the whole inner iteration stays compiled without baking
        multi-megabyte operator constants into outer jits.
        """
        assert frequencies.shape[0] == reference_fr.shape[0]
        self._check_band(frequencies)
        core, opdata = self.getFRCore()
        return LossFunction(
            core, opdata, frequencies, reference_fr, func_type,
            scaling_params, call_seg=self._call_segment(jac=True),
        )

    def getResidualFunction(
        self,
        frequencies: jax.Array,
        reference_fr: jax.Array,
        kind: str = "log_afc",
        scaling_params: jax.Array = None,
        freq_chunk: int | None = None,
        jac_mode: str = "auto",
    ) -> "ResidualFunction":
        """Vector-residual factory for Gauss-Newton
        (``optimize.optimize_gauss_newton``).  ``freq_chunk`` bounds Jacobian
        memory for large sweeps x many parameters (jacfwd mode only; the
        default adjoint mode is bounded by the engine's own sweep chunking).
        ``jac_mode``: 'adjoint' | 'fwd' | 'auto' — see ResidualFunction."""
        assert frequencies.shape[0] == reference_fr.shape[0]
        self._check_band(frequencies)
        core, opdata = self.getFRCore()
        adjoint_selected = (
            jac_mode in ("auto", "adjoint")
            and kind in ("log_afc", "afc")
            and _has_adjoint_hooks(core)
        )
        if (freq_chunk is None and kind != "complex"
                and not adjoint_selected
                and self._resolve_engine() == "mixed"):
            # jacfwd value_and_jac runs (1 + n_params) solve lanes per
            # frequency (primal + one implicit-diff JVP per parameter);
            # cap the live Jacobian chunk to the sweep's memory budget
            freq_chunk = self._auto_freq_chunk(
                lanes=1 + len(np.asarray(self.parameters)))
        return ResidualFunction(
            core, opdata, frequencies, reference_fr, kind, scaling_params,
            freq_chunk=freq_chunk,
            call_seg=self._call_segment(jac=True, adjoint=adjoint_selected),
            jac_mode=jac_mode,
        )

    # ------------------------------------------------------------------

    def solveInverse(
        self,
        arg0: npt.ArrayLike,
        loss_type: str,
        optimizer: str,
        compression: tuple = (False, 0),
        comp_alg: int = 1,
        ref_fr: tuple[np.ndarray, np.ndarray] = None,
        use_rel: bool = False,
        use_scaling: bool = False,
        use_constraints: bool = False,
        report: bool = True,
        log: bool = True,
        case_name: str = "",
        uid: str = None,
        extra_info: str = "",
        **opt_kwargs,
    ) -> optResult:
        """Inverse solve from an initial guess or bounds (Problem.py:641-914).

        Optimizers: 'trust_region'/'tr', 'coord_descent'/'cd',
        'coord_descent_mem'/'cd_mem', 'grad_descent'/'gd', 'newton',
        'lbfgs', plus scipy globals 'de' (differential evolution) and 'shgo'.
        """
        from scipy.optimize import OptimizeResult, differential_evolution, shgo

        if ref_fr is None:
            ref_fr = getattr(self, "reference_fr", None)
            if ref_fr is None:
                raise ValueError(
                    "Cannot solve inverse problem as `ref_fr` argument was "
                    "not provided and the Problem object doesn't have a "
                    "reference_fr attribute."
                )
        ref_fr = [np.asarray(ref_fr[0]), np.asarray(ref_fr[1])]

        if not isinstance(compression, tuple):
            raise TypeError(
                "`compression` argument should have a type `tuple`, not "
                f"{type(compression)}."
            )
        if len(compression) != 2:
            raise ValueError(
                f"`compression` tuple should have 2 elements, not {len(compression)}."
            )

        if compression[0]:
            comp = Compressor(ref_fr[0], ref_fr[1], compression[1], comp_alg)
            ref_fr[0], ref_fr[1] = comp(compression[1])

        # ---- start point / search box + O(1) scaling --------------------
        # Public-API contract (reference Problem.py:760-798, same semantics
        # in our own structure): a 1-D arg0 is a start point — absolute, or
        # with use_rel relative corrections on the Problem's own parameter
        # vector, theta_0 = (1 + arg0) * parameters; a 2-D arg0 is a
        # per-parameter bounds box for the global optimizers.  use_scaling
        # rescales so the optimizer iterates on O(1) variables while the
        # loss multiplies the scale back in.
        guess = np.asarray(arg0, dtype=np.float64)
        scaling_params = None
        if guess.ndim == 2:
            x0_bds = guess
            if use_scaling:
                # each bounds row maps to O(1) by its largest magnitude
                scaling_params = np.max(np.abs(guess), axis=1)
                x0_bds = guess / scaling_params[:, None]
        elif guess.ndim == 1:
            if use_rel:
                base = getattr(self, "parameters", None)
                if base is None:
                    raise ValueError(
                        "use_rel=True reads arg0 as relative corrections on "
                        "the Problem's own parameter vector, but this "
                        "Problem carries none (material built without "
                        "parameters)."
                    )
                factors = jnp.asarray(guess) + 1.0
                start = jnp.asarray(base) * factors
            else:
                factors = None
                start = jnp.asarray(guess)
            if use_scaling:
                scaling_params = start
                x0_bds = factors if use_rel else jnp.ones_like(start)
            else:
                x0_bds = start
        else:
            raise ValueError(
                f"arg0 must be a 1-D start point or a 2-D bounds box; got "
                f"ndim={guess.ndim}."
            )

        loss = self.getLossFunction(ref_fr[0], ref_fr[1], loss_type, scaling_params)

        # reporting/constraints below want a filled scaling array; bounds
        # boxes carry it once per bound column
        if scaling_params is None:
            scaling_params = np.ones_like(np.asarray(x0_bds))
        elif np.asarray(x0_bds).ndim == 2:
            scaling_params = np.repeat(
                np.asarray(scaling_params)[:, None], 2, axis=1)

        local = {
            "trust_region": optimize_trust_region,
            "tr": optimize_trust_region,
            "gauss_newton": "GN",
            "gn": "GN",
            "coord_descent": optimize_cd,
            "cd": optimize_cd,
            "coord_descent_mem": optimize_cd_mem2,
            "cd_mem": optimize_cd_mem2,
            "grad_descent": optimize_gd,
            "gd": optimize_gd,
            "newton": optimize_newton,
            "lbfgs": optimize_lbfgs,
        }

        if optimizer in local:
            optimizer_func = local[optimizer]
            if optimizer_func == "GN":
                from ..optimize import optimize_gauss_newton

                kind = {"MSE": "complex", "RMSE": "complex",
                        "MSE_AFC": "afc", "MSE_LOG_AFC": "log_afc"}[loss_type]
                resfn = self.getResidualFunction(
                    ref_fr[0], ref_fr[1], kind=kind,
                    scaling_params=None if np.all(np.asarray(scaling_params) == 1.0)
                    else jnp.asarray(np.asarray(scaling_params)
                                     if np.asarray(scaling_params).ndim == 1
                                     else np.asarray(scaling_params)[:, 0]),
                )

                def optimizer_func(_loss, x0, **kw):
                    return optimize_gauss_newton(resfn, x0, **kw)
        elif optimizer == "de":
            optimizer_func = differential_evolution
        elif optimizer == "shgo":
            optimizer_func = shgo
            if use_constraints:
                opt_kwargs["constraints"] = self.material.get_constraints(
                    np.asarray(scaling_params)[:, 0]
                )
            options = opt_kwargs.get("options", {})
            options["jac"] = loss.grad
            options["hess"] = loss.hessian
            opt_kwargs["options"] = options
        else:
            raise ValueError(f"Optimizer type `{optimizer}` is not supported!")

        t_start = perf_counter()
        result = optimizer_func(loss, x0_bds, **opt_kwargs)
        t_end = perf_counter()
        elapsed = (t_end - t_start) / 60

        if use_scaling and optimizer in ("de", "shgo"):
            d = dict(result)
            if np.asarray(scaling_params).ndim == 1:
                d["x"] = d["x"] * scaling_params
            else:
                d["x"] = d["x"] * np.asarray(scaling_params)[:, 1]
            result = OptimizeResult(d)
        elif use_scaling:
            sp = (
                np.asarray(scaling_params)
                if np.asarray(scaling_params).ndim == 1
                else np.asarray(scaling_params)[:, 1]
            )
            result = result._replace(x=result.x * sp)

        if uid is None:
            full_str = case_name + default_uid()
        else:
            full_str = case_name + uid

        if optimizer in ("de", "shgo"):
            # normalize scipy results to optResult fields (Problem.py:855-863)
            setattr(result, "f", result.fun)
            if optimizer == "de":
                setattr(result, "x_history", list(result.population))
            else:
                setattr(result, "x_history", list(result.xl))
            setattr(result, "f_history", [-1.0])
            setattr(result, "status", result.message)
            setattr(result, "niter", result.nit)

        if report:
            rel_err1 = "Unknown"
            rel_err2 = "Unknown"
            if getattr(self, "parameters", None) is not None:
                params0 = np.array(self.parameters)
                if guess.ndim != 2:
                    rel_err1 = (np.array(x0_bds) * scaling_params - params0) / params0
                rel_err2 = (np.array(result.x) - params0) / params0

            def a2s(s):
                if isinstance(s, str):
                    return s
                return np.array2string(np.array(s), separator=", ", precision=5)

            comp_str = ""
            if compression[0]:
                comp_str = (
                    f"Using compression algorithm {comp_alg} with "
                    f"{compression[1]} points.\n"
                )
            s_pa_bd = "parameters" if guess.ndim == 1 else "bounds"
            f0 = result.f_history[0] if len(result.f_history) else float("nan")

            rep_str = (
                f"{self.accelerometer}\n{self.material}\n{self.geometry}\n"
                + extra_info
                + comp_str
                + f"Starting {s_pa_bd}: {a2s(np.asarray(x0_bds) * scaling_params)}.\n"
                f"With relative error: {a2s(rel_err1)}.\n"
                f"Initial loss: {f0}.\n"
                f"Elapsed time: {elapsed} min.\n"
                f"After optimization: {a2s(result.x)}.\n"
                f"With relative error: {a2s(rel_err2)}.\n"
                f"Resulting loss: {result.f}.\n"
                f"Optimization status: {result.status}.\n"
                f"Optimizer parameters: {opt_kwargs}.\n"
                f"Optimizer type: {optimizer}.\n"
                f"Scaling parameters used: {scaling_params}.\n"
            )
            print(rep_str, end="")
            write_report(full_str, rep_str)

        if log:
            write_log(full_str, result)

        return result

    def solveInverseLocal(self, *args, **kwargs):
        """Alias for ``solveInverse`` (reference Problem.py:916-921)."""
        return self.solveInverse(*args, **kwargs)

    # ------------------------------------------------------------------

    def getModePicture(self, freq: float, use_freefem: bool = False,
                       params: np.ndarray = None, ax=None):
        """Deflection-magnitude contour at one frequency (Problem.py:521-608).

        Rendered directly from our mesh: Morley vertex DOFs *are* the P1
        nodal values the reference extracts through a FreeFEM round-trip
        (Problem.py:576-597).  ``use_freefem`` selects the reference's
        FreeFEM-native ``plot`` window (Problem.py:598-606); there is no
        FreeFEM process here, so it warns and falls through to the native
        rendering (a superset: same P1 field, same contours, works for the
        3-field path the reference NotImplements).
        """
        if use_freefem:
            import warnings

            warnings.warn(
                "use_freefem=True: no FreeFEM process in the TPU-native "
                "framework; rendering the same P1 deflection field with "
                "matplotlib instead", stacklevel=2)
        if params is None:
            params = self.parameters

        import matplotlib.pyplot as plt

        op = self.op
        prec = self.precision
        h = self.geometry.height
        freqs = jnp.asarray([freq], prec.real)

        # eager (un-jitted) single-frequency solve on the host CPU —
        # visualization path; plain LU there regardless of the sweep engine
        # (the mixed engine's band operators aren't needed for one frame,
        # and the reference's 3-field case raises NotImplementedError at
        # Problem.py:536 — here it renders |w|).
        with jax.default_device(jax.devices("cpu")[0]):
            rows = jnp.asarray(op.pattern.rows)
            cols = jnp.asarray(op.pattern.cols)
            omegas = 2.0 * jnp.pi * freqs
            params_j = jnp.asarray(params, prec.real)
            if self.is_symmetric_path:
                transform = self.material.get_D_transform(h)
                D = transform(params_j, omegas[0]).astype(prec.complex)
                K_flat = jnp.einsum("k,kn->n", D,
                                    jnp.asarray(op.Ks, prec.complex))
                bK = jnp.einsum("k,kn->n", D,
                                jnp.asarray(op.fKs, prec.complex))
            else:
                transform = self.material.get_ABD_transform(h)
                Av, Bv, Dv = transform(params_j, omegas[0])
                coeffs = jnp.stack([Av, Bv, Dv]).astype(prec.complex)
                ABD = np.stack([
                    op.mat_stack(["A" + x for x in MODULI_INDICES]),
                    op.mat_stack(["B" + x for x in MODULI_INDICES]),
                    op.mat_stack(["D" + x for x in MODULI_INDICES]),
                ])
                fABD = np.stack([
                    op.lift_stack(["A" + x for x in MODULI_INDICES]),
                    op.lift_stack(["B" + x for x in MODULI_INDICES]),
                    op.lift_stack(["D" + x for x in MODULI_INDICES]),
                ])
                K_flat = jnp.einsum("mk,mkn->n", coeffs,
                                    jnp.asarray(ABD, prec.complex))
                bK = jnp.einsum("mk,mkn->n", coeffs,
                                jnp.asarray(fABD, prec.complex))
            B = bK[None, :] - (omegas**2)[:, None] * jnp.asarray(
                self.fInertia, prec.complex
            )[None, :]
            U = sweep_solve(K_flat, jnp.asarray(self.MInertia, prec.real), B,
                            omegas, rows, cols, op.n_free,
                            engine="direct", chunk=self.chunk)
        u_free = np.asarray(U[0])

        complete = np.array(op.boundary_value, np.float64)
        complete[~op.constrained] = np.abs(u_free)
        V = self.mesh.num_nodes
        w_off = 0 if self.is_symmetric_path else 2 * V
        vertex_vals = complete[w_off: w_off + V]

        if ax is None:
            ax = plt.gca()
        tri = self.mesh.to_matplotlib_tri()
        cf = ax.tricontourf(tri, vertex_vals, 2000, cmap="coolwarm",
                            norm="symlog", antialiased=False)
        ax.set_aspect("equal")
        plt.colorbar(cf, ax=ax, orientation="horizontal", location="bottom",
                     pad=0.05)
        self.mesh.plot(ax=ax, alpha=0.4)
        ax.axis("off")
        return vertex_vals
