"""Second-generation Pallas TPU kernel for unstructured SpMV (SELL v2).

Same hardware thesis as pallas_sell.py (the only fast gather on TPU is
the within-vreg ``tpu.dynamic_gather``; x stays VMEM-resident as
(S, 128) subrows and each vreg of the ELL slot array addresses a small
set of aligned x windows), redesigned around three measured facts:

* **Dynamic control flow costs more than the math.**  v1 loops bands
  statically over the *global* max row degree (K8) and windows via a
  dynamic ``fori_loop`` with SMEM bounds; on a 16-nnz-mean FEM matrix
  with K8 = 64 that is ~4x padding work plus scalar-loop overhead per
  window.  v2 cuts the (RCM-ordered) row groups into a few *contiguous
  classes*, each compiled with fully static, per-band window counts —
  zero dynamic loops, zero SMEM bound reads in the hot path.
* **Narrow windows beat wide ones.**  With 128-wide windows an element
  address is just (window, lane): no subrow select.  Measured on the
  150k-dof FEM problem: 45 ops/vreg at W=128 vs 124 at W=1024.
* **Per-program overhead amortizes.**  R row groups per grid program.

Reference role: the format-general accelerated SpMV of the reference's
GPU backends (amgcl/backend/cuda.hpp:61 cusparseSpMV) — redesigned for
a machine whose only gather primitive is vreg-local.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sell import _lane_gather


# ----------------------------------------------------------------------
# host-side packing
# ----------------------------------------------------------------------

def _segment_classes(K8_g, NW_gb, R, max_classes):
    """Partition the group range [0, Gr) (at R-group granularity) into at
    most ``max_classes`` contiguous segments minimizing the static-unroll
    cost  sum_c len_c * (10*B_c + 6*sum_b NWmax_cb).

    Returns a list of (start_chunk, end_chunk) pairs (R-group units)."""
    G = len(K8_g)
    Gr = -(-G // R)
    if Gr <= 1:
        return [(0, max(Gr, 1))]
    Bmax = NW_gb.shape[1]
    # chunk-level maxima
    pad = Gr * R - G
    K8c = np.pad(K8_g, (0, pad)).reshape(Gr, R).max(axis=1)
    NWc = np.pad(NW_gb, ((0, pad), (0, 0)), constant_values=0)
    NWc = NWc.reshape(Gr, R, Bmax).max(axis=1)          # (Gr, Bmax)

    INF = np.inf
    cost = np.full((Gr, Gr), INF)
    for i in range(Gr):
        nw_run = np.maximum.accumulate(NWc[i:], axis=0)     # (Gr-i, Bmax)
        b_run = np.maximum.accumulate(K8c[i:]) // 8
        length = np.arange(1, Gr - i + 1)
        cost[i, i:] = length * (10.0 * b_run + 6.0 * nw_run.sum(axis=1))

    C = max(1, int(max_classes))
    dp = cost[0].copy()                  # dp[j] = best cost covering [0, j]
    choice = [np.zeros(Gr, dtype=np.int64)]
    for _ in range(1, C):
        # extend: dp2[j] = min_i dp[i-1] + cost[i, j]
        cand = dp[:-1, None] + cost[1:, :]
        best = np.argmin(cand, axis=0)
        dp2 = cand[best, np.arange(Gr)]
        keep = dp2 < dp
        dp = np.where(keep, dp2, dp)
        choice.append(np.where(keep, best + 1, -1))
    # walk back
    bounds = []
    j = Gr - 1
    c = C - 1
    while j >= 0:
        i = choice[c][j] if c > 0 else 0
        if c > 0 and i < 0:              # level c unused at j: drop down
            c -= 1
            continue
        bounds.append((int(i), int(j) + 1))
        j = int(i) - 1
        c = max(c - 1, 0)
    return bounds[::-1]


def pack_sell2(A: sp.csr_matrix, W: int = 128, R: int = 4,
               max_classes: int = 6, nw_cap: int = 64,
               k8_cap: int = 512, l_cap: int = 384):
    """Pack a CSR matrix into the classed SELL v2 layout.

    Returns None when any row-group band needs more than ``nw_cap``
    windows, when any row is wider than ``k8_cap``, or when a class's
    total window count exceeds ``l_cap`` (caller falls back), else a
    dict:
      classes: list of per-class dicts with
         data (K8_c, Gp_c*128) f64, enc (K8_c, Gp_c*128) i32,
         bases (Gp_c, L_c) i32, nw (tuple per band), g0, G_c (un-padded)
      n, m, S_pad, W, R, nnz.

    The k8/l caps bound the *generated kernel*, not just VMEM: the band
    and window loops are fully unrolled (that is what makes the kernel
    fast), so a pathologically dense class — e.g. the coarse operator
    of a 6-column-nullspace hierarchy, K≈1300 / ~4900 windows — would
    unroll to a ~90 MB Mosaic program that blows the scoped-VMEM stack
    and takes an hour to compile.  Such operators take the dynamic-loop
    v1 kernel or hybrid ELL instead (ops/formats.py fallback chain).
    """
    A = sp.csr_matrix(A)
    A.sort_indices()
    n, m = A.shape
    if n == 0 or A.nnz == 0:
        return None
    SH = W // 128
    counts = np.diff(A.indptr)
    G = -(-n // 128)
    R = max(1, min(R, G))
    n_pad = G * 128
    Kmax = max(int(counts.max()), 1)
    if Kmax > k8_cap:
        return None            # before the (n, K8max) staging allocs
    K8max = -(-Kmax // 8) * 8
    Bmax = K8max // 8

    ell_c = np.zeros((n_pad, K8max), dtype=np.int64)
    ell_d = np.zeros((n_pad, K8max), dtype=np.float64)
    valid = np.zeros((n_pad, K8max), dtype=bool)
    rows = np.repeat(np.arange(n), counts)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    ell_c[rows, offs] = A.indices
    ell_d[rows, offs] = A.data
    valid[rows, offs] = True

    # Per-group degree and per-(group, band) window analysis, fully
    # vectorized: sort each (group, band) segment of 128*8 block ids,
    # mark first occurrences (distinct windows), and dense-rank every
    # element within its segment.  The rank IS the element's window
    # index, so no per-element searchsorted is needed later — the old
    # per-(g, b) np.unique loop cost tens of seconds at 1M-dof scale.
    gcounts = np.pad(counts, (0, n_pad - n)).reshape(G, 128)
    K8_g = np.maximum(-(-gcounts.max(axis=1) // 8) * 8, 8)
    blk2 = np.where(valid, ell_c // W, -1) \
        .reshape(G, 128, Bmax, 8).transpose(0, 2, 1, 3) \
        .reshape(G, Bmax, 128 * 8)
    order = np.argsort(blk2, axis=-1, kind="stable")
    srt = np.take_along_axis(blk2, order, axis=-1)
    first = np.empty(srt.shape, dtype=bool)
    first[..., 0] = srt[..., 0] >= 0
    first[..., 1:] = (np.diff(srt, axis=-1) != 0) & (srt[..., 1:] >= 0)
    NW_gb = first.sum(axis=-1)                        # (G, Bmax)
    if NW_gb.max() > nw_cap:
        return None
    rank_sorted = np.cumsum(first, axis=-1) - 1       # window idx, sorted
    rank = np.empty_like(rank_sorted)
    np.put_along_axis(rank, order, rank_sorted, axis=-1)
    w_elem = rank.reshape(G, Bmax, 128, 8).transpose(0, 2, 1, 3) \
        .reshape(n_pad, K8max)                        # per-element window

    bounds = _segment_classes(K8_g, NW_gb, R, max_classes)

    classes = []
    for (i0, i1) in bounds:
        g0, g1 = i0 * R, min(i1 * R, G)
        if g0 >= G:
            continue
        Gc = g1 - g0
        Gp = -(-Gc // R) * R
        K8c = int(K8_g[g0:g1].max())
        Bc = K8c // 8
        nw = tuple(int(NW_gb[g0:g1, b].max()) for b in range(Bc))
        L = max(sum(nw), 1)
        if L > l_cap:
            return None        # unrolled-kernel size cap (see docstring)
        off = np.concatenate([[0], np.cumsum(nw)]).astype(np.int64)

        data_c = np.zeros((K8c, Gp * 128), dtype=np.float64)
        enc_c = np.zeros((K8c, Gp * 128), dtype=np.int32)
        bases_c = np.zeros((Gp, L), dtype=np.int32)
        sl = slice(g0 * 128, g1 * 128)
        data_c[:, : Gc * 128] = ell_d[sl, :K8c].T

        # window tables: scatter each distinct window (value srt, dense
        # rank j) of this class's groups into its (group, off[b] + j) slot
        Bc = K8c // 8
        fc = first[g0:g1, :Bc]
        gi_idx, b_idx, _ = np.nonzero(fc)
        j_idx = rank_sorted[g0:g1, :Bc][fc]
        bases_c[gi_idx, off[b_idx] + j_idx] = srt[g0:g1, :Bc][fc] * SH

        # enc: the element's window index is its precomputed dense rank;
        # the intra-window subrow follows from the column id alone
        cols = ell_c[sl, :K8c]
        ok = valid[sl, :K8c]
        w = w_elem[sl, :K8c]
        if SH == 1:
            e = w * 128 + (cols & 127)
        else:
            hi = (cols // 128) - (cols // W) * SH
            e = (w * SH + hi) * 128 + (cols & 127)
        enc_c[:, : Gc * 128] = np.where(ok, e, 0).T
        classes.append(dict(
            data=data_c, enc=enc_c, bases=bases_c,
            nw=nw, g0=g0, G=Gc, Gp=Gp, K8=K8c,
        ))

    S_pad = -(-m // 128)
    S_pad = -(-(S_pad + 8) // 8) * 8   # slack for 8-row window table loads
    return dict(classes=classes, n=n, m=m, S_pad=S_pad, W=W, R=R,
                nnz=int(A.nnz), G=G)


def _fit_R(R, Gp, stream_bytes_per_group, resident_bytes=0):
    """Largest divisor of ``R`` whose per-program streamed block (data +
    enc, double-buffered by Mosaic) stays under the scoped-VMEM budget
    (XLA's default scoped limit is 16 MiB; dense row classes with large
    K8 overflow it at R=4).  ``resident_bytes`` counts whole-array-
    resident blocks (the full x2 via its (S_pad, 128) BlockSpec, the
    window tables, the out tile) that share the same scoped limit — at
    multi-million columns x2 alone passes several MiB, so it must come
    out of the streaming budget rather than a fixed slack.  ``Gp`` is
    padded to a multiple of R at pack time, so any divisor keeps the
    grid exact."""
    budget = max(14 * 2**20 - resident_bytes, 2**20)
    r = R
    while r > 1 and 2 * stream_bytes_per_group * r > budget:
        r -= 1
        while R % r or Gp % r:
            r -= 1
    return max(r, 1)


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------

def _sell2_kernel(R, SH, nw, load8,
                  data_ref, enc_ref, bases_ref, x_ref, y_ref):
    """One program = R row groups of one class; everything static."""
    off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
    B = len(nw)
    # bf16 data streams at half width but gathers/accumulates in f32:
    # Mosaic packs bf16 rows two-per-sublane, so dynamically-indexed
    # (1, 128) x-window loads would need provably-aligned rows — and f32
    # accumulation is numerically stronger anyway.
    dt = data_ref.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    for r in range(R):
        lsl = slice(r * 128, (r + 1) * 128)
        acc = jnp.zeros((1, 128), cdt)
        for b in range(B):
            if nw[b] == 0:
                continue
            d = data_ref[b * 8 : b * 8 + 8, lsl]
            if dt == jnp.bfloat16:
                d = d.astype(cdt)
            e = enc_ref[b * 8 : b * 8 + 8, lsl]
            lo = e & jnp.int32(127)
            hs = jax.lax.shift_right_logical(e, jnp.int32(7))
            gacc = jnp.zeros((8, 128), cdt)
            for w in range(nw[b]):
                t = bases_ref[0, r, off[b] + w]
                if SH == 1:
                    if load8:
                        row = x_ref[pl.ds(t, 8), :][0:1]
                    else:
                        row = x_ref[pl.ds(t, 1), :]
                    Tv = jnp.broadcast_to(row, (8, 128))
                    g = _lane_gather(Tv, lo)
                    if nw[b] == 1:
                        gacc = g
                    else:
                        gacc = gacc + jnp.where(hs == jnp.int32(w), g, 0.0)
                else:
                    TT = x_ref[pl.ds(t, SH), :]
                    for s in range(SH):
                        Bv = jnp.broadcast_to(TT[s : s + 1, :], (8, 128))
                        g = _lane_gather(Bv, lo)
                        if nw[b] == 1 and SH == 1:
                            gacc = g
                        else:
                            gacc = gacc + jnp.where(
                                hs == jnp.int32(w * SH + s), g, 0.0
                            )
            acc = acc + jnp.sum(d * gacc, axis=0, keepdims=True)
        y_ref[0:1, lsl] = acc


def sell2_spmv_pallas(meta, x: jax.Array, class_arrays,
                      interpret: bool = False,
                      load8: bool = False) -> jax.Array:
    """y = A @ x for a packed SELL v2 matrix.

    ``class_arrays`` is a list of (data, enc, bases) device triples in
    the order of meta['classes']."""
    n, m, S_pad, W, R = (meta[k] for k in ("n", "m", "S_pad", "W", "R"))
    SH = W // 128
    dt = class_arrays[0][0].dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    xc = x.astype(cdt)
    x2 = jnp.pad(xc, (0, S_pad * 128 - m)).reshape(S_pad, 128)

    outs = []
    for spec, (data, enc, bases) in zip(meta["classes"], class_arrays):
        K8, Gp, Gc, nw = spec["K8"], spec["Gp"], spec["G"], spec["nw"]
        L = bases.shape[1]
        Rc = _fit_R(
            R, Gp, (data.dtype.itemsize + 4) * K8 * 128,
            resident_bytes=x2.nbytes + bases.nbytes
            + R * 128 * jnp.dtype(cdt).itemsize,
        )
        grid = Gp // Rc
        # Mosaic requires SMEM block sublane dims divisible by 8: carry
        # the window table as (grid, Rp, L) with the per-program rows
        # padded up to a sublane multiple (the pad is KBs, fused by XLA).
        Rp = -(-Rc // 8) * 8
        b3 = bases.reshape(grid, Rc, L)
        if Rp != Rc:
            b3 = jnp.pad(b3, ((0, 0), (0, Rp - Rc), (0, 0)))
        y = pl.pallas_call(
            partial(_sell2_kernel, Rc, SH, nw, load8),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec(
                    (1, Rp, L),
                    lambda g: (g, jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (S_pad, 128),
                    lambda g: (jnp.int32(0), jnp.int32(0)),
                ),
            ],
            out_specs=pl.BlockSpec((1, Rc * 128),
                                   lambda g: (jnp.int32(0), g)),
            out_shape=jax.ShapeDtypeStruct((1, Gp * 128), cdt),
            interpret=interpret,
        )(data, enc, b3, x2)
        outs.append(y[0, : Gc * 128])
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return out[:n].astype(x.dtype)


# ----------------------------------------------------------------------
# double-f32 (f64-accurate) kernel
# ----------------------------------------------------------------------
#
# Mosaic has no 64-bit vectors, so f64 operators historically fell back
# to the serialized XLA gather path (~0.14 Gelem/s).  This variant keeps
# the windowed-gather structure and carries VALUES as double-f32 pairs
# (hi + lo, hi = f32(v), lo = f32(v - hi)) with compensated arithmetic:
# error-free TwoProd (Dekker/Veltkamp split — Mosaic exposes no FMA) and
# TwoSum accumulation.  Result error is O(eps_f32^2) ≈ 1e-14 relative —
# enough to certify 1e-8 true residuals, which is all the f64 outer
# operators (refine's defect correction) need.  Gather work doubles
# (x_hi and x_lo windows); VPU work is ~10x the plain kernel's, but the
# plain kernel is gather-bound, not VPU-bound.

def _df_two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _df_two_prod(a, b):
    p = a * b
    ca = a * 4097.0
    ah = ca - (ca - a)
    al = a - ah
    cb = b * 4097.0
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _sell2_df_kernel(R, nw, S_pad,
                     dh_ref, dl_ref, enc_ref, bases_ref, x_ref,
                     yh_ref, yl_ref):
    """Double-f32 variant of _sell2_kernel (W=128 only).  x_ref is
    (2*S_pad, 128): hi plane then lo plane."""
    off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
    B = len(nw)
    for r in range(R):
        lsl = slice(r * 128, (r + 1) * 128)
        sh = jnp.zeros((8, 128), jnp.float32)
        sl = jnp.zeros((8, 128), jnp.float32)
        for b in range(B):
            if nw[b] == 0:
                continue
            dh = dh_ref[b * 8 : b * 8 + 8, lsl]
            dl = dl_ref[b * 8 : b * 8 + 8, lsl]
            e = enc_ref[b * 8 : b * 8 + 8, lsl]
            lo = e & jnp.int32(127)
            hs = jax.lax.shift_right_logical(e, jnp.int32(7))
            gh = jnp.zeros((8, 128), jnp.float32)
            gl = jnp.zeros((8, 128), jnp.float32)
            for w in range(nw[b]):
                t = bases_ref[0, r, off[b] + w]
                rowh = x_ref[pl.ds(t, 1), :]
                rowl = x_ref[pl.ds(t + jnp.int32(S_pad), 1), :]
                g1 = _lane_gather(jnp.broadcast_to(rowh, (8, 128)), lo)
                g2 = _lane_gather(jnp.broadcast_to(rowl, (8, 128)), lo)
                if nw[b] == 1:
                    gh, gl = g1, g2
                else:
                    sel = hs == jnp.int32(w)
                    gh = gh + jnp.where(sel, g1, 0.0)
                    gl = gl + jnp.where(sel, g2, 0.0)
            ph, pe = _df_two_prod(dh, gh)
            cross = dh * gl + dl * gh
            sh, e1 = _df_two_sum(sh, ph)
            sl = sl + (pe + cross + e1)
        # reduce 8 sublanes -> 1 with pairwise double-f32 merges
        for half in (4, 2, 1):
            h1, l1 = sh[:half], sl[:half]
            h2, l2 = sh[half : 2 * half], sl[half : 2 * half]
            sh, e = _df_two_sum(h1, h2)
            sl = l1 + l2 + e
        yh_ref[0:1, lsl] = sh
        yl_ref[0:1, lsl] = sl


def sell2_df_spmv_pallas(meta, x: jax.Array, class_arrays,
                         interpret: bool = False) -> jax.Array:
    """y = A @ x with f64-accurate double-f32 arithmetic.  x f64; the
    class arrays carry (data_hi, data_lo, enc, bases)."""
    n, m, S_pad, W, R = (meta[k] for k in ("n", "m", "S_pad", "W", "R"))
    assert W == 128, "df kernel packs with W=128"
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(x.dtype)).astype(jnp.float32)
    x2 = jnp.stack([xh, xl])                               # (2, m)
    x2 = jnp.pad(x2, ((0, 0), (0, S_pad * 128 - m)))
    x2 = x2.reshape(2 * S_pad, 128)

    outs = []
    for spec, (dh, dl, enc, bases) in zip(meta["classes"], class_arrays):
        K8, Gp, Gc, nw = spec["K8"], spec["Gp"], spec["G"], spec["nw"]
        L = bases.shape[1]
        Rc = _fit_R(R, Gp, 12 * K8 * 128,      # hi + lo + enc streams
                    resident_bytes=x2.nbytes + bases.nbytes
                    + 2 * R * 128 * 4)
        grid = Gp // Rc
        # see sell2_spmv_pallas: SMEM sublane dims must be multiples of 8
        Rp = -(-Rc // 8) * 8
        b3 = bases.reshape(grid, Rc, L)
        if Rp != Rc:
            b3 = jnp.pad(b3, ((0, 0), (0, Rp - Rc), (0, 0)))
        yh, yl = pl.pallas_call(
            partial(_sell2_df_kernel, Rc, nw, S_pad),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec((K8, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec(
                    (1, Rp, L),
                    lambda g: (g, jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (2 * S_pad, 128),
                    lambda g: (jnp.int32(0), jnp.int32(0)),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, Rc * 128), lambda g: (jnp.int32(0), g)),
                pl.BlockSpec((1, Rc * 128), lambda g: (jnp.int32(0), g)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, Gp * 128), jnp.float32),
                jax.ShapeDtypeStruct((1, Gp * 128), jnp.float32),
            ],
            interpret=interpret,
        )(dh, dl, enc, b3, x2)
        outs.append(
            yh[0, : Gc * 128].astype(x.dtype)
            + yl[0, : Gc * 128].astype(x.dtype)
        )
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return out[:n]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["arrays"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class Sell2F64Matrix:
    """f64-accurate SELL operator: values as double-f32 (hi, lo) planes
    sharing one enc/bases table.  Selected on TPU for unstructured f64
    operators (refine's outer defect SpMV, f64 hierarchies) where plain
    f64 falls to the serialized XLA gather path.  astype(float32) is free
    structurally: it returns a Sell2Matrix viewing the hi planes."""

    arrays: tuple          # ((data_hi, data_lo, enc, bases), ...)
    meta: tuple

    @property
    def _m(self):
        d = dict(self.meta)
        d["classes"] = [dict(c) for c in d["classes"]]
        return d

    @property
    def shape(self):
        d = dict(self.meta)
        return (d["n"], d["m"])

    @property
    def dtype(self):
        return jnp.dtype(jnp.float64)

    @property
    def block(self):
        return 1

    @property
    def nnz(self):
        return dict(self.meta)["nnz"]

    @property
    def nbytes(self):
        return sum(
            dh.size * 8 + e.size * 4 + b.size * 4
            for dh, _, e, b in self.arrays
        )

    def astype(self, dtype):
        if jnp.dtype(dtype) == jnp.float64:
            return self
        return Sell2Matrix(
            arrays=tuple(
                (dh.astype(dtype), e, b) for dh, _, e, b in self.arrays
            ),
            meta=self.meta,
        )

    @staticmethod
    def from_scipy(A, R: int = 4, max_classes: int = 6, nw_cap: int = 64):
        packed = pack_sell2(A, W=128, R=R, max_classes=max_classes,
                            nw_cap=nw_cap)
        if packed is None:
            return None
        arrays = []
        classes_meta = []
        for c in packed["classes"]:
            hi = c["data"].astype(np.float32)
            lo = (c["data"] - hi.astype(np.float64)).astype(np.float32)
            arrays.append((
                jnp.asarray(hi),
                jnp.asarray(lo),
                jnp.asarray(c["enc"]),
                jnp.asarray(c["bases"]),
            ))
            classes_meta.append(tuple(sorted(
                (k, v if not isinstance(v, tuple) else v)
                for k, v in c.items()
                if k not in ("data", "enc", "bases")
            )))
        meta = tuple(sorted(
            [(k, v) for k, v in packed.items() if k != "classes"]
            + [("classes", tuple(classes_meta))]
        ))
        return Sell2F64Matrix(arrays=tuple(arrays), meta=meta)

    def spmv(self, x: jax.Array) -> jax.Array:
        if jax.default_backend() == "cpu":
            return self._spmv_xla(x)
        return sell2_df_spmv_pallas(self._m, x, self.arrays)

    def _spmv_xla(self, x: jax.Array) -> jax.Array:
        """CPU mirror: recombine hi+lo to f64 and run the plain decode."""
        plain = Sell2Matrix(
            arrays=tuple(
                (dh.astype(jnp.float64) + dl.astype(jnp.float64), e, b)
                for dh, dl, e, b in self.arrays
            ),
            meta=self.meta,
        )
        return plain._spmv_xla(x.astype(jnp.float64)).astype(x.dtype)

    def to_scipy(self) -> sp.csr_matrix:
        plain = Sell2Matrix(
            arrays=tuple(
                (dh.astype(jnp.float64) + dl.astype(jnp.float64), e, b)
                for dh, dl, e, b in self.arrays
            ),
            meta=self.meta,
        )
        return plain.to_scipy()


# ----------------------------------------------------------------------
# format wrapper
# ----------------------------------------------------------------------

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["arrays"],
    meta_fields=["meta"],
)
@dataclasses.dataclass(frozen=True)
class Sell2Matrix:
    """Classed vreg-windowed sliced-ELL matrix (see module docstring).
    Scalar operators; selected for unstructured patterns on TPU when the
    per-band window count stays under the cap (bandwidth-reduced order
    helps)."""

    arrays: tuple          # ((data, enc, bases), ...) per class
    meta: tuple            # hashable static proxy of the pack dict

    @property
    def _m(self):
        d = dict(self.meta)
        d["classes"] = [dict(c) for c in d["classes"]]
        return d

    @property
    def shape(self):
        d = dict(self.meta)
        return (d["n"], d["m"])

    @property
    def dtype(self):
        return self.arrays[0][0].dtype

    @property
    def block(self):
        return 1

    @property
    def nnz(self):
        return dict(self.meta)["nnz"]

    @property
    def nbytes(self):
        return sum(
            d.size * d.dtype.itemsize + e.size * 4 + b.size * 4
            for d, e, b in self.arrays
        )

    def astype(self, dtype):
        return dataclasses.replace(
            self,
            arrays=tuple(
                (d.astype(dtype), e, b) for d, e, b in self.arrays
            ),
        )

    @staticmethod
    def from_scipy(A, dtype=jnp.float32, W: int = 128, R: int = 4,
                   max_classes: int = 6, nw_cap: int = 64):
        packed = pack_sell2(A, W=W, R=R, max_classes=max_classes,
                            nw_cap=nw_cap)
        if packed is None:
            return None
        arrays = []
        classes_meta = []
        for c in packed["classes"]:
            arrays.append((
                jnp.asarray(c["data"], dtype=dtype),
                jnp.asarray(c["enc"]),
                jnp.asarray(c["bases"]),
            ))
            classes_meta.append(tuple(sorted(
                (k, v if not isinstance(v, tuple) else v)
                for k, v in c.items()
                if k not in ("data", "enc", "bases")
            )))
        meta = tuple(sorted(
            [(k, v) for k, v in packed.items() if k != "classes"]
            + [("classes", tuple(classes_meta))]
        ))
        return Sell2Matrix(arrays=tuple(arrays), meta=meta)

    def spmv(self, x: jax.Array) -> jax.Array:
        if jax.default_backend() == "cpu":
            return self._spmv_xla(x)
        return sell2_spmv_pallas(self._m, x, self.arrays)

    def _spmv_xla(self, x: jax.Array) -> jax.Array:
        """Decode windows to flat columns, gather via XLA (CPU path,
        bit-identical semantics)."""
        m = self._m
        SH = m["W"] // 128
        cdt = (jnp.float32 if self.dtype == jnp.bfloat16 else self.dtype)
        xc = x.astype(cdt)
        xp = jnp.pad(xc, (0, m["S_pad"] * 128 - m["m"]))
        outs = []
        for spec, (data, enc, bases) in zip(m["classes"], self.arrays):
            K8, Gp, Gc = spec["K8"], spec["Gp"], spec["G"]
            nw = spec["nw"]
            off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
            hs = enc >> 7                                  # (K8, Gp*128)
            lo = enc & 127
            w = hs // SH
            hi = hs - w * SH
            b_idx = jnp.repeat(jnp.arange(K8 // 8, dtype=jnp.int32), 8)
            g_idx = (jnp.arange(Gp * 128, dtype=jnp.int32) // 128)
            woff = jnp.asarray(off[:-1], dtype=jnp.int32)[b_idx]
            widx = jnp.clip(woff[:, None] + w, 0, bases.shape[1] - 1)
            t = bases[g_idx[None, :], widx]                # subrow base
            cols = (t + hi) * 128 + lo
            y = jnp.sum(data.astype(cdt) * xp[cols], axis=0)
            outs.append(y[: Gc * 128])
        out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        return out[: m["n"]].astype(x.dtype)

    def to_scipy(self) -> sp.csr_matrix:
        m = self._m
        SH = m["W"] // 128
        mats = []
        for spec, (data, enc, bases) in zip(m["classes"], self.arrays):
            K8, Gp, Gc = spec["K8"], spec["Gp"], spec["G"]
            nw = spec["nw"]
            off = np.concatenate([[0], np.cumsum(nw)]).astype(int)
            e = np.asarray(enc)
            d = np.asarray(data, dtype=np.float64)
            hs = e >> 7
            lo = e & 127
            w = hs // SH
            hi = hs - w * SH
            b_idx = np.repeat(np.arange(K8 // 8), 8)
            g_idx = np.arange(Gp * 128) // 128
            woff = off[:-1][b_idx]
            widx = np.clip(woff[:, None] + w, 0, bases.shape[1] - 1)
            t = np.asarray(bases)[g_idx[None, :], widx]
            cols = (t + hi) * 128 + lo
            rows = np.broadcast_to(
                np.arange(Gp * 128)[None, :], d.shape
            )
            M = sp.coo_matrix(
                (d.ravel(), (rows.ravel(), cols.ravel())),
                shape=(Gp * 128, m["S_pad"] * 128),
            ).tocsr()[: Gc * 128]
            mats.append(M)
        M = sp.vstack(mats).tocsr()[: m["n"], : m["m"]]
        M.eliminate_zeros()
        M.sum_duplicates()
        return sp.csr_matrix(M)
