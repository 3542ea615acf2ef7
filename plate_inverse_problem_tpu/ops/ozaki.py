"""Exact-integer (Ozaki-style) limb decomposition of the f64 band apply.

The mixed engine's hot loop needs f64-GRADE operator applications (Krylov
iterates/residuals must resolve ~1e-13 of the operator's abs-sum — an f32
apply floors the iteration, see ops/mixed.py).  XLA:TPU has no true f64
dot: an f64 einsum lowers to a materialized elementwise product + reduce,
so the band-tier apply streams a (B, nb, b, 3b) f64 product tensor through
HBM — tens of GB per apply at the 100k tier, which is what made the 104k
sweep run at 4 solves/s (SCALE.md round 4).

This module replaces that with exact INTEGER arithmetic on the MXU:

1. Each operator row is scaled by a power of two (exact) and peeled into
   ``L`` radix-64 signed digits (int8, |d| <= 32) — a 6-bit-per-limb
   fixed-point representation carrying 6L bits below the row's magnitude.
2. The Krylov vector is peeled the same way per (lane, block) with its own
   power-of-two scales.
3. y = A x becomes L x L limb-pair GEMMs ``int8 x int8 -> int32``.  The
   accumulation is EXACT (products <= 2^10, contraction length b <= 2^11
   => |sums| < 2^21; int8->int32 verified exact on-chip,
   .probes/int8_gemm.py), so the only approximation in the whole apply is
   the 2^(-6L) limb-representation cutoff — ~2^-48 of the row/block
   magnitude at L=8, BETTER than the runtime's emulated f64 (multiply
   ~120 eps, .probes/f64_tpu.py).
4. The int32 limb products are recombined in f64 with the power-of-two
   scales — pure elementwise work at memory speed.

Radix 64 (not 128) is deliberate armor against the axon runtime's sloppy
f64 (CLAUDE.md): the digit peel is SELF-CORRECTING for any per-step
rounding error as long as no digit overflows int8 — the next residual
absorbs it exactly.  With radix 64 a device ``round`` that lands +-1 off
drifts the residual to at most ~1.5, keeping digits under |96| < 127;
radix-128 digits (<= 64) would wrap int8 on the same drift and poison
whole rows.  And 2^21-bounded sums stay exact even if a lowering ever
routes the integer GEMM through f32 accumulation (integers < 2^24 are
exact in f32) — robustness on both axes for one extra limb of traffic.

Traffic per fused apply: the int8 limb tensors (L/8 the bytes of the f64
band tensor each) plus the (L^2, B, n) int32 pair planes — no product
tensor over the contraction axis, and every FLOP lands on the MXU's
integer path.

Counterpart of the reference's per-call CSC matvec (csc_matvec.h:31-66)
at f64 grade; the TPU-native answer to "no f64 hardware dot exists".
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .band import BandLayout

__all__ = ["OzakiBand", "build_ozaki_band", "ozaki_mv", "N_LIMBS"]

N_LIMBS = 8          # radix-64 digits: 6L = 48 bits below each scale
_RADIX = 64.0


def _pow2_ceil(m):
    """Smallest power of two >= m (elementwise, exact result by
    construction); m == 0 maps to 1.0 so downstream divisions are safe.

    log2 can be an ulp off near exact powers, so the candidate is
    bracketed with explicit fix-ups rather than trusted.
    """
    e = jnp.floor(jnp.log2(jnp.maximum(m, 1e-300))) + 1.0
    t = jnp.exp2(e)
    t = jnp.where(t < m, t * 2.0, t)
    t = jnp.where(t * 0.5 >= m, t * 0.5, t)
    return jnp.where(m == 0.0, jnp.ones_like(t), t)


def _peel_digits(u, n_limbs: int):
    """Peel u in [-0.5, 0.5] into radix-64 signed digits (int8 stack).

    value(digits) = sum_l d_l * 64^-(l+1) represents u to 2^(-6L-1).
    Every step is exact in IEEE f64 (power-of-two multiply + Sterbenz
    subtraction); on the axon device's sloppy f64 any bounded per-step
    error is absorbed by the next residual (see module docstring) —
    pinned by tests/test_ozaki.py.
    """
    digits = []
    r = u
    for _ in range(n_limbs):
        s = r * _RADIX
        d = jnp.round(s)
        r = s - d
        digits.append(d.astype(jnp.int8))
    return jnp.stack(digits)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class OzakiBand:
    """Device-resident limb decomposition of a stack of band operators.

    ``D``: (S, 3, L, nb, b, b) int8 — per operator, per block-diagonal
    (sub/main/super), per limb; ``tau``: (S, nb, b) f64 power-of-two row
    scales.  ``n``/``b``/``nb`` are the owning block-tridiagonal
    layout's dimensions (BandLayout itself holds unhashable host index
    arrays, so only the shape triple rides along as static metadata).

    Registered as a pytree so instances pass straight through jit/scan
    boundaries as runtime arguments — never closed over (CLAUDE.md:
    closures over device arrays are fatal to the AOT compiler).
    """
    n: int = field(metadata=dict(static=True))
    b: int = field(metadata=dict(static=True))
    nb: int = field(metadata=dict(static=True))
    n_limbs: int = field(metadata=dict(static=True))
    D: jax.Array = field(repr=False)
    tau: jax.Array = field(repr=False)


def _peel_chunk(bc, b: int, n_limbs: int):
    """(S, cb, b, 3b) f64 chunk -> ((S, 3, L, cb, b, b) int8, (S, cb, b))."""
    m = jnp.max(jnp.abs(bc), axis=-1)                  # (S, cb, b)
    tau = 2.0 * _pow2_ceil(m)                          # |band|/tau <= 0.5
    u = bc / tau[..., None]
    D = _peel_digits(u, n_limbs)                       # (L, S, cb, b, 3b)
    D = D.reshape(D.shape[:-1] + (3, b))
    # (L, S, cb, b, 3, b) -> (S, 3, L, cb, b, b)
    D = jnp.transpose(D, (1, 4, 0, 2, 3, 5))
    return D, tau


# one-shot peel below this f64 band-tensor size; above it the peel's
# ~(2 + L) live f64 copies OOM the chip (measured: 17 GB of HLO temps at
# the 104k tier, S=2, nb=162, b=640 — a 3.2 GB band), so large tensors
# stream block-chunks through a fori_loop with in-place output updates
_ONESHOT_BYTES = 1 << 28


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _band_to_limbs(band, nb: int, b: int, n_limbs: int):
    """(S, nb, b, 3b) f64 band stack -> int8 limb tensor + row scales."""
    S = band.shape[0]
    if band.size * 8 <= _ONESHOT_BYTES:
        return _peel_chunk(band, b, n_limbs)
    # chunk size: largest divisor of nb holding the per-chunk f64 input
    # under ~256 MB (divisor => no pad copy of the 3+ GB input tensor)
    blk_bytes = S * b * 3 * b * 8
    cap = max(1, _ONESHOT_BYTES // (2 * blk_bytes))
    cb = max(d for d in range(1, min(nb, cap) + 1) if nb % d == 0)
    nc = nb // cb
    D0 = jnp.zeros((S, 3, n_limbs, nb, b, b), jnp.int8)
    t0 = jnp.zeros((S, nb, b), band.dtype)

    def body(i, carry):
        D, tau = carry
        bc = jax.lax.dynamic_slice_in_dim(band, i * cb, cb, axis=1)
        Dc, tc = _peel_chunk(bc, b, n_limbs)
        D = jax.lax.dynamic_update_slice_in_dim(D, Dc, i * cb, axis=3)
        tau = jax.lax.dynamic_update_slice_in_dim(tau, tc, i * cb, axis=1)
        return D, tau

    return jax.lax.fori_loop(0, nc, body, (D0, t0))


def build_ozaki_band(band_stack, layout: BandLayout,
                     n_limbs: int = N_LIMBS) -> OzakiBand:
    """Decompose a stack of f64 band tensors (S, nb, b, 3b) once per
    parameter set.  Inputs come straight from ``flat_to_band`` on the
    flat operator values; gradients never flow through limbs (the AD
    matvec stays on the flat scatter — see ops/mixed.py)."""
    band_stack = jax.lax.stop_gradient(band_stack).astype(jnp.float64)
    D, tau = _band_to_limbs(band_stack, layout.nb, layout.b, n_limbs)
    return OzakiBand(n=layout.n, b=layout.b, nb=layout.nb,
                     n_limbs=n_limbs, D=D, tau=tau)


def _z_to_limbs(zb, n_limbs: int):
    """(B, nb, b) f64 padded blocks -> ((L, B, nb, b) int8, (B, nb) f64)."""
    m = jnp.max(jnp.abs(zb), axis=-1)
    tau = 2.0 * _pow2_ceil(m)
    u = zb / tau[..., None]
    return _peel_digits(u, n_limbs), tau


def ozaki_mv(oz: OzakiBand, x, s0: int = 0, s1: int | None = None):
    """y = A_s x for operators s0:s1 of the stack: (..., n) -> (S, ..., n).

    Matches ``jnp.stack([band_mv(A_s, x, layout) for s])`` to the limb
    cutoff (~2^(-6L) of each row/block magnitude).  One set of z limbs is
    shared by all operators and all three block diagonals; the limb-pair
    contraction runs as one int8->int32 einsum per diagonal.  ``s0``/
    ``s1`` select a contiguous operator sub-stack (static Python slice —
    lets one decomposition serve K-only / K,M / K,M,Ki call sites).
    """
    n, b, nb = oz.n, oz.b, oz.nb
    L = oz.n_limbs
    D = oz.D[s0:s1]
    tau = oz.tau[s0:s1]
    S = D.shape[0]

    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    xf = x.reshape((B, n)).astype(jnp.float64)
    zb = jnp.pad(xf, ((0, 0), (0, nb * b - n))).reshape(B, nb, b)
    Zl, tz = _z_to_limbs(zb, L)                        # (L,B,nb,b), (B,nb)

    # zero-block padding on the block axis for the sub/super diagonals
    Zp = jnp.pad(Zl, ((0, 0), (0, 0), (1, 1), (0, 0)))
    tzp = jnp.pad(tz, ((0, 0), (1, 1)), constant_values=1.0)

    # product weight of limb pair (l, j): 64^-(l+1) * 64^-(j+1)
    lw = _RADIX ** -(jnp.arange(1, L + 1, dtype=jnp.float64))
    w = lw[:, None] * lw[None, :]                      # (L, L)

    y = jnp.zeros((S, B, nb, b), jnp.float64)
    for di in (0, 1, 2):                               # sub, main, super
        Zs = Zp[:, :, di:di + nb]
        tzs = tzp[:, di:di + nb]
        # (S, L, nb, b, b) x (L, B, nb, b) -> (S, l, j, B, nb, b) int32;
        # EXACT: |digits| <= 32, contraction length b <= 2048 keeps every
        # accumulated sum below 2^10 * 2^11 = 2^21 — exact in int32 AND
        # under a hypothetical f32-accumulating lowering
        O = jnp.einsum("slqic,jBqc->sljBqi", D[:, di], Zs,
                       preferred_element_type=jnp.int32)
        # weight + reduce over the (l, j) pair axes, one fused pass over
        # O.  Summation ORDER is uncritical even at near-null (resonance-
        # iterate) vectors: the catastrophic row-sum cancellation already
        # happened inside the EXACT integer GEMM, so every weighted pair
        # term is at most ~64^-2 of the row abs-scale (the (0,0) term is
        # the truncated-digit product, cancelled to ~64^-1 already) and
        # the f64 reduce rounds at eps of THAT — measured 2x faster than
        # an ordered anti-diagonal Horner walk at identical accuracy
        # (.probes/ozaki_band_104k.py, 21k tier).
        yd = (O.astype(jnp.float64)
              * w[None, :, :, None, None, None]).sum(axis=(1, 2))
        y = y + yd * tzs[None, :, :, None]
    y = y * tau[:, None]                               # (S, B, nb, b)
    return y.reshape((S, B, nb * b))[..., :n].reshape((S,) + lead + (n,))
