"""Block-tridiagonal banded operator application — the MXU SpMV.

XLA's scatter-add SpMV (ops/scatter.spmv_flat) serializes its updates and
runs ~100x off HBM speed-of-light on TPU at FEM sizes (measured 207 ms for
nnz=2e6, batch 16, f64 at n=82k).  This module replaces it in the mixed
engine's hot loop with a layout the MXU *likes*:

1. Reverse-Cuthill-McKee reorders the free DOFs; a 2D plate mesh then has
   bandwidth O(sqrt(n)) (measured 477 at n=82k).
2. With block size b >= bandwidth the matrix is block-TRIDIAGONAL in dense
   (b, b) blocks: y_q = A_{q,0} x_{q-1} + A_{q,1} x_q + A_{q,2} x_{q+1}.
3. Operator application is then one batched einsum over static dense
   shapes — pure MXU matmuls, no gather/scatter at all (measured 81 ms f64
   / 6.9 ms f32 for the same workload: 2.5x / 6.3x).

The permutation is applied ONCE, at build time, as a relabeling of the free
DOFs (the mixed engine permutes its pattern indices and every n-vector when
it adopts the layout), so the solve itself never pays a gather.

The flat (nnz,) theta-dependent stiffness values scatter into the block
tensor once per parameter set (``flat_to_band``, ~0.3 s at nnz=2e6) — the
scatter is linear, so implicit-diff tangents flow through it exactly.

Counterpart of the reference's per-call CSC matvec kernel
(/root/reference/source/jax_plate_lib/include/csc_matvec.h:31-66), redesigned
for a systolic-array machine instead of a cache-hierarchy CPU.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BandLayout:
    """Static metadata of the block-tridiagonal layout (host-built).

    ``perm``: free-DOF relabeling (new index i holds old DOF perm[i]);
    ``lin``: flat scatter targets mapping pattern entry s into the
    (nb, 3, b, b) block tensor (already in permuted row/col space).
    """
    n: int
    b: int
    nb: int
    bandwidth: int
    perm: np.ndarray = field(repr=False)
    iperm: np.ndarray = field(repr=False)
    lin: np.ndarray = field(repr=False)


def build_band_layout(rows, cols, n: int, block_multiple: int = 128,
                      min_block: int = 256) -> BandLayout:
    """RCM-reorder the pattern and lay it out block-tridiagonally.

    Host-side, called once per Problem.  ``lin`` assumes the caller will
    relabel its pattern to ``iperm[rows], iperm[cols]`` (the mixed engine
    does this for all operator data and n-vectors).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    A = sp.csr_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                      shape=(n, n))
    perm = np.asarray(reverse_cuthill_mckee(A + A.T, symmetric_mode=True),
                      dtype=np.int64)
    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)
    rp = iperm[rows]
    cp = iperm[cols]
    bw = int(np.abs(rp - cp).max()) if rows.size else 0

    b = max(min_block, -(-bw // block_multiple) * block_multiple)
    nb = -(-n // b)
    q = rp // b
    d = cp // b - q + 1
    if d.min() < 0 or d.max() > 2:  # cannot happen for b >= bw
        raise ValueError("pattern is not block-tridiagonal at this block size")
    # (q, i_loc, d, j_loc) layout — the tensor is stored (nb, b, 3b), the
    # exact operand shape of the batched GEMM in band_mv, so XLA never
    # materializes a relaid-out copy of the GB-scale operator (measured:
    # several HBM-copies of the band tensor with a (nb, 3, b, b) layout,
    # one per einsum call site)
    lin = ((q * b + rp % b) * 3 + d) * b + cp % b
    idt = np.int32 if lin.max() < 2**31 else np.int64
    return BandLayout(n=n, b=b, nb=nb, bandwidth=bw, perm=perm, iperm=iperm,
                      lin=lin.astype(idt))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _scatter_band(vals, lin, nb: int, b: int):
    lead = vals.shape[:-1]
    flat = jnp.zeros(lead + (nb * 3 * b * b,), vals.dtype)
    return flat.at[..., lin].add(vals).reshape(lead + (nb, b, 3 * b))


def flat_to_band(vals, layout: BandLayout, lin=None):
    """Scatter flat pattern data (possibly stacked (..., nnz)) into the
    (..., nb, b, 3b) block tensor.  Linear — JVP/VJP are the same scatter
    and its transpose-gather, so AD through the operator values is exact.

    ``lin`` lets callers pass the index array as a device-resident jit
    argument (recommended — see CLAUDE.md on closure constants).  The
    scatter is jitted so an EAGER build (the Problem-construction path)
    runs as one program — the zeros + scatter pair would otherwise hold
    two GB-scale transients alive on the accelerator."""
    lin = layout.lin if lin is None else lin
    return _scatter_band(vals, jnp.asarray(lin), layout.nb, layout.b)


def flat_to_band_host(vals, layout: BandLayout) -> np.ndarray:
    """Host (numpy) counterpart of :func:`flat_to_band` for static operator
    data — kept for tests/tools; the Problem path builds on device."""
    nb, b = layout.nb, layout.b
    out = np.zeros(nb * 3 * b * b, dtype=np.asarray(vals).dtype)
    np.add.at(out, layout.lin, np.asarray(vals))
    return out.reshape(nb, b, 3 * b)


# f64 band tensors above this size segment the block axis of the GEMM
# (bytes); per-scan-step budget for the emulated-f64 dot's materialized
# operand/product temps (bytes, with an 8x headroom for vmapped frequency
# lanes band_mv cannot see).  Module-level so tests can shrink them.
_F64_SEG_THRESHOLD = 256 << 20
_F64_SEG_BUDGET = 1 << 30


def band_mv(band, x, layout: BandLayout, precision=None):
    """y = A x for block-tridiagonal ``band`` (nb, b, 3b); x (..., n).

    Pure dense batched matmul over static shapes — every FLOP lands on the
    MXU.  The leading dims of x are flattened into ONE batch axis and the
    contraction is the canonical ``(q,i,c) x (B,q,c)`` batched GEMM, so
    every call site shares one operand layout of the GB-scale band tensor
    (distinct layouts made XLA hold one relaid-out copy each).  f64 inputs
    use XLA's emulated f64 GEMM (exact); f32 inputs run at native MXU
    speed (callers that only need preconditioner accuracy pass
    ``precision`` to drop below the global 'highest' default).

    Above ``_F64_SEG_THRESHOLD`` the f64 GEMM scans the block axis in
    segments: XLA:TPU's emulated-f64 dot materializes operand/product
    temps at the (lanes, nb, b, 3b) scale (measured 3.77 GB at n=82k x 8
    frequency lanes — the scale-tier sweep OOM), and the scan bounds them
    to one segment.  Exact either way: segmentation only splits the
    block-row axis, never a contraction."""
    n, b, nb = layout.n, layout.b, layout.nb
    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    xf = x.reshape((B, n))
    xp = jnp.pad(xf, ((0, 0), (0, nb * b - n)))
    xb = xp.reshape(B, nb, b)
    xm = jnp.pad(xb, ((0, 0), (1, 1), (0, 0)))
    xn = jnp.stack([xm[:, :-2, :], xm[:, 1:-1, :], xm[:, 2:, :]],
                   axis=-2)  # (B, nb, 3, b)
    xn = xn.reshape(B, nb, 3 * b)
    if (band.dtype == jnp.float64
            and band.size * 8 > _F64_SEG_THRESHOLD):
        qs = max(1, _F64_SEG_BUDGET // (8 * B * b * 3 * b * 8))
        k = -(-nb // qs)
        padq = k * qs - nb
        bandp = jnp.pad(band, ((0, padq), (0, 0), (0, 0))) \
            .reshape(k, qs, b, 3 * b)
        xnp = jnp.pad(xn, ((0, 0), (0, padq), (0, 0))) \
            .reshape(B, k, qs, 3 * b).transpose(1, 0, 2, 3)

        def step(_, args):
            bq, xq = args
            return None, jnp.einsum("qic,Bqc->Bqi", bq, xq,
                                    precision=precision)

        _, ys = jax.lax.scan(step, None, (bandp, xnp))   # (k, B, qs, b)
        y = ys.transpose(1, 0, 2, 3).reshape(B, k * qs * b)[:, : nb * b]
        return y.reshape(lead + (nb * b,))[..., :n]
    y = jnp.einsum("qic,Bqc->Bqi", band, xn, precision=precision)
    return y.reshape(lead + (nb * b,))[..., :n]


def band_mv_f32(band, x, layout: BandLayout, precision=None):
    """f32 band matvec with an optional Pallas streaming backend.

    Dispatch knob for the PRECONDITIONER-grade call sites (two-grid
    smoother, refinement residuals): env ``PIP_PALLAS_BAND=1`` routes to
    ops/pallas_band.band_mv_pallas (opt-in until chip-proven; exact
    agreement pinned by tests/test_band.py); default and CPU stay on the
    XLA batched GEMM.  The exact f64 apply never dispatches here.
    """
    import os

    import jax

    if (os.environ.get("PIP_PALLAS_BAND", "0") == "1"
            and jax.default_backend() != "cpu"):
        from .pallas_band import band_mv_pallas

        return band_mv_pallas(band, x, layout)
    return band_mv(band, x, layout, precision=precision)


@dataclass(frozen=True)
class RectBandLayout:
    """Rectangular block-band layout for a prolongation P (fine x coarse).

    The coarse DOFs are relabeled by the *induced* order (sorted by the
    mean fine-RCM row of their P column), then partitioned into the SAME
    number of blocks as the fine band layout (block size ``bc``).  Every
    column then only touches fine blocks within ``hw`` block offsets, so
    prolongation and restriction are single batched f32 GEMMs over the
    (nb, b, nd*bc) tensor — no scatter, no gather.
    """
    n_fine: int
    n_coarse: int
    nb: int
    b: int
    bc: int
    nd: int        # number of block diagonals (2*hw + 1)
    hw: int
    perm_c: np.ndarray = field(repr=False)   # induced coarse relabeling
    slots: np.ndarray = field(repr=False)    # compact index -> padded slot
    lin: np.ndarray = field(repr=False)      # scatter targets into the tensor
    vals: np.ndarray = field(repr=False)     # P entries (induced order)


def build_rect_band(P_csr, layout: BandLayout,
                    bc_multiple: int = 128) -> RectBandLayout:
    """Lay out a (permuted-row-space) prolongation as rectangular block-band.

    ``P_csr`` rows must already be in the fine layout's RCM order.  Returns
    the layout plus flat (vals, lin) so callers can build the tensor on
    device (transfers stay a few MB).
    """
    import scipy.sparse as sp

    P = sp.coo_matrix(P_csr)
    n_f, n_c = P.shape
    nb, b = layout.nb, layout.b

    # each coarse column is assigned to the fine BLOCK holding the mean of
    # its support rows (a uniform slot->block mapping fails badly when the
    # coarse density varies along the fine RCM axis — measured 189 block
    # diagonals vs 3-5 with target-block assignment); block capacity is
    # the largest bucket, rounded up to the lane multiple
    colsum = np.zeros(n_c)
    colcnt = np.zeros(n_c)
    np.add.at(colsum, P.col, P.row.astype(np.float64))
    np.add.at(colcnt, P.col, 1.0)
    key = np.where(colcnt > 0, colsum / np.maximum(colcnt, 1.0), 0.0)
    target = np.clip((key // b).astype(np.int64), 0, nb - 1)
    order = np.lexsort((key, target))              # group by block, local order
    perm_c = order.astype(np.int64)
    rank = np.empty(n_c, np.int64)
    # rank within each target block
    tgt_sorted = target[order]
    starts = np.searchsorted(tgt_sorted, np.arange(nb))
    rank[order] = np.arange(n_c) - starts[tgt_sorted]

    counts = np.bincount(target, minlength=nb)
    bc = max(bc_multiple,
             -(-int(counts.max()) // bc_multiple) * bc_multiple)
    slot = target * bc + rank
    q = P.row // b
    qc = target[P.col]
    hw = int(np.abs(qc - q).max()) if P.nnz else 0
    nd = 2 * hw + 1
    lin = ((q * nd + (qc - q + hw)) * b + P.row % b) * bc + slot[P.col] % bc
    idt = np.int32 if lin.max() < 2**31 else np.int64
    return RectBandLayout(n_fine=n_f, n_coarse=n_c, nb=nb, b=b, bc=bc,
                          nd=nd, hw=hw, perm_c=perm_c,
                          slots=slot[perm_c].astype(np.int32),
                          lin=lin.astype(idt),
                          vals=P.data.astype(np.float32))


def rect_band_tensor(rl: RectBandLayout):
    """Device-built (nb, b, nd*bc) f32 prolongation tensor."""
    flat = jnp.zeros((rl.nb * rl.nd * rl.b * rl.bc,), jnp.float32)
    t = flat.at[jnp.asarray(rl.lin)].add(jnp.asarray(rl.vals))
    return t.reshape(rl.nb, rl.nd, rl.b, rl.bc).transpose(0, 2, 1, 3) \
            .reshape(rl.nb, rl.b, rl.nd * rl.bc)


def _coarse_windows(rl: RectBandLayout, xs):
    """(B, nb*bc) padded-slot vector -> (B, nb, nd*bc) block windows."""
    B = xs.shape[0]
    xb = xs.reshape(B, rl.nb, rl.bc)
    xm = jnp.pad(xb, ((0, 0), (rl.hw, rl.hw), (0, 0)))
    win = jnp.stack([xm[:, d:d + rl.nb, :] for d in range(rl.nd)], axis=2)
    return win.reshape(B, rl.nb, rl.nd * rl.bc)


def rect_band_mv(Pt, xc, rl: RectBandLayout, slots, precision=None):
    """Prolongation y_f = P x_c as one batched f32 GEMM; xc (..., n_c)
    compact.  ``slots`` maps compact coarse indices into the padded
    block-slot space (a per-block-capacity layout — tiny scatter)."""
    lead = xc.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    xs = jnp.zeros((B, rl.nb * rl.bc), xc.dtype)
    xs = xs.at[:, slots].set(xc.reshape(B, rl.n_coarse))
    win = _coarse_windows(rl, xs)
    y = jnp.einsum("qic,Bqc->Bqi", Pt, win, precision=precision)
    return y.reshape(lead + (rl.nb * rl.b,))[..., :rl.n_fine]


def rect_band_tmv(Pt, rf, rl: RectBandLayout, slots, precision=None):
    """Restriction r_c = P^T r_f — the transposed GEMM plus a fold of the
    overlapping block windows back onto the padded slots (nd shifted
    adds, pure elementwise), then the compact gather."""
    lead = rf.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    rp = jnp.pad(rf.reshape(B, rl.n_fine),
                 ((0, 0), (0, rl.nb * rl.b - rl.n_fine)))
    rb = rp.reshape(B, rl.nb, rl.b)
    w = jnp.einsum("qic,Bqi->Bqc", Pt, rb, precision=precision)
    w = w.reshape(B, rl.nb, rl.nd, rl.bc)
    acc = jnp.zeros((B, rl.nb + 2 * rl.hw, rl.bc), w.dtype)
    for d in range(rl.nd):
        acc = acc.at[:, d:d + rl.nb, :].add(w[:, :, d, :])
    acc = acc[:, rl.hw:rl.hw + rl.nb, :].reshape(B, rl.nb * rl.bc)
    return acc[:, slots].reshape(lead + (rl.n_coarse,))


def permute_pattern(layout: BandLayout, rows, cols):
    """Relabel pattern indices into the RCM ordering (host-side)."""
    return (layout.iperm[np.asarray(rows)].astype(np.int32),
            layout.iperm[np.asarray(cols)].astype(np.int32))


def permute_vector(layout: BandLayout, v, axis: int = -1):
    """Relabel an n-vector (or a stack of them along ``axis``) into the RCM
    ordering: entry i of the result is old entry perm[i] (host-side)."""
    return np.take(np.asarray(v), layout.perm, axis=axis)
