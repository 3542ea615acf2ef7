"""Pallas TPU kernel for the block-tridiagonal band matvec.

``ops.band.band_mv`` expresses y = A x as an XLA batched GEMM over the
(nb, b, 3b) band tensor.  At the scale tier that GEMM is HBM-bound — the
band tensor (hundreds of MB .. GB) must stream through VMEM once per
apply — but XLA's batched-small-N GEMM schedule reaches only ~15% of HBM
bandwidth (measured 7 ms for a 0.8 GB f32 band at B=16 on v5e, i.e.
~110 GB/s of ~820).  This kernel streams the band tensor through a
Pallas grid (Pallas double-buffers the per-block DMA automatically) and
performs the (B, 3b) x (3b, rt) window product on the MXU per row tile,
targeting bandwidth-limited time.

Numerics are identical to band_mv (same contraction, f32 MXU with
preferred_element_type=f32): the kernel serves the f32 preconditioner
paths (two-grid smoother, refinement residuals); the exact f64 apply
stays on XLA's emulated-f64 GEMM.

Reference counterpart: csc_matvec.h:31-66 (the reference's CPU SpMV);
this is the TPU-native answer at the >8k-DOF band tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band import BandLayout

__all__ = ["band_mv_pallas"]


def _kernel(band_ref, xl_ref, xc_ref, xr_ref, out_ref):
    # window (B, 3b) against the row tile (rt, 3b): contract the 3b axis
    xwin = jnp.concatenate([xl_ref[:], xc_ref[:], xr_ref[:]], axis=1)
    out_ref[:] = jax.lax.dot_general(
        xwin, band_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("nb", "b", "interpret"))
def _band_mv_pallas(band, xp, nb: int, b: int, interpret: bool = False):
    """xp: (B, nb*b) padded input; returns (B, nb*b)."""
    B = xp.shape[0]
    # row tile must DIVIDE the block size or the tail rows of each block
    # are silently never written (nr truncates)
    if b % 256 == 0:
        rt = 256
    elif b % 128 == 0:
        rt = 128
    else:
        rt = b  # small/odd blocks: one row tile per block
    nr = b // rt
    assert nr * rt == b, (b, rt)

    def x_spec(shift):
        def imap(q, r):
            # lax primitives only: jnp.clip's ufunc dispatch re-enters the
            # tracer inside the index-map trace and blows the recursion
            # limit under the axon platform (measured, pallas_band_bench)
            hi = jnp.asarray(nb - 1, dtype=q.dtype)
            lo = jnp.asarray(0, dtype=q.dtype)
            qq = jax.lax.max(jax.lax.min(q + shift, hi), lo)
            # index maps must return ONE dtype: a Python 0 traces as an
            # i64 const under global x64 and Mosaic rejects the mixed
            # (i32, i64) func.return
            return (jnp.zeros((), q.dtype), qq)
        return pl.BlockSpec((B, b), imap, memory_space=pltpu.VMEM)

    grid = (nb, nr)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rt, 3 * b),
                         lambda q, r: (q, r, jnp.zeros((), q.dtype)),
                         memory_space=pltpu.VMEM),
            x_spec(-1), x_spec(0), x_spec(+1),
        ],
        out_specs=pl.BlockSpec(
            (B, rt),
            lambda q, r: (jnp.zeros((), q.dtype), q * nr + r),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb * b), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nb * b * 3 * b,
            bytes_accessed=nb * b * 3 * b * 4 + 2 * B * nb * b * 4,
            transcendentals=0,
        ),
    )(band, xp, xp, xp)
    return out


def band_mv_pallas(band, x, layout: BandLayout, interpret: bool = False):
    """Drop-in f32 counterpart of :func:`ops.band.band_mv`.

    ``x`` (..., n) is zero-padded to the block grid; edge windows clamp to
    the first/last block — safe because ``flat_to_band`` never scatters
    coefficients into the out-of-range window slots, so the clamped lanes
    multiply zeros.  ``interpret=True`` runs the Pallas interpreter (CPU
    tests).
    """
    n, b, nb = layout.n, layout.b, layout.nb
    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    xf = x.reshape((B, n)).astype(jnp.float32)
    # B must satisfy the f32 sublane tile (8); pad lanes with zeros
    Bp = -(-B // 8) * 8
    xp = jnp.pad(xf, ((0, Bp - B), (0, nb * b - n)))
    y = _band_mv_pallas(band.astype(jnp.float32), xp, nb=nb, b=b,
                        interpret=interpret)
    return y[:B, :n].reshape(lead + (n,))
