"""Sparse matrix storage for TPU.

The device-resident format is a *planar block-ELLPACK* layout designed around
TPU tiling rules (arrays tile as (8,128) sublane×lane; the contiguous
dimension should be long):

  data : (K, b, b, nb) — K = max block-nonzeros per block-row, b = block size,
                          nb = number of block rows.  data[k, :, :, i] is the
                          k-th b×b block of block-row i.
  cols : (K, nb) int32 — block-column index of the k-th block of block-row i.

Padding entries carry ``cols == 0`` and ``data == 0`` so that gathered values
multiply to exact zeros — no masks are needed on the SpMV path.  The long
`nb` axis sits last, so every elementwise op and gather runs full-lane on the
VPU; there is no ragged CSR indirection anywhere on the solve path.

This one container plays the role of the reference's CSR ``crs`` struct
(reference: amgcl/backend/builtin.hpp:61) *and* its block-value
``static_matrix`` storage (reference: amgcl/value_type/static_matrix.hpp:43):
block size is a static field, b == 1 being the scalar case.

Host-side setup (coarsening, Galerkin products, smoother factorizations)
works on scipy CSR/BSR and converts once per level, mirroring the
setup/solve split of the reference (amgcl/amg.hpp:351-365) while keeping the
whole *solve* phase on-device.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols"],
    meta_fields=["shape", "block", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class SparseMatrix:
    """Planar block-ELLPACK sparse matrix (a jax pytree).

    shape is the *scalar* (rows, cols) shape; block is the static block size
    b; nnz is the true scalar nonzero count (for reporting / complexity
    stats, reference: amgcl/amg.hpp:560-598).
    """

    data: jax.Array  # (K, b, b, nb)
    cols: jax.Array  # (K, nb) int32
    shape: tuple    # (n_rows, n_cols) in scalar terms
    block: int
    nnz: int

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def block_rows(self) -> int:
        return self.data.shape[-1]

    @property
    def block_cols(self) -> int:
        return self.shape[1] // self.block

    @property
    def width(self) -> int:
        """Max nonzero blocks per block row (the ELL width K)."""
        return self.data.shape[0]

    @property
    def nbytes(self) -> int:
        """Device bytes, the analogue of backend::bytes (reference:
        amgcl/backend/interface.hpp:191)."""
        return self.data.size * self.data.dtype.itemsize + self.cols.size * 4

    def astype(self, dtype) -> "SparseMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    # ------------------------------------------------------------------
    # Host conversions
    # ------------------------------------------------------------------

    @staticmethod
    def from_scipy(A, block: int = 1, dtype=jnp.float32) -> "SparseMatrix":
        """Build from any scipy sparse matrix.

        ``block > 1`` reinterprets the scalar matrix as block-valued (the
        capability of the reference's adapter::block_matrix,
        amgcl/adapter/block_matrix.hpp:44).
        """
        n_rows, n_cols = A.shape
        if block == 1:
            A = sp.csr_matrix(A)
            if not A.has_canonical_format:
                A = A.copy()   # sum_duplicates mutates in place
                A.sum_duplicates()
            data, cols, indptr = A.data, A.indices, A.indptr
            nnz = A.nnz
            # (nb, K) ragged→padded, then transpose to planar (K, nb).
            counts = np.diff(indptr)
            K = max(int(counts.max()) if len(counts) else 1, 1)
            ell_data = np.zeros((n_rows, K), dtype=np.float64)
            ell_cols = np.zeros((n_rows, K), dtype=np.int32)
            # vectorized ragged scatter
            rows = np.repeat(np.arange(n_rows), counts)
            offs = np.arange(nnz) - np.repeat(indptr[:-1], counts)
            ell_data[rows, offs] = data
            ell_cols[rows, offs] = cols
            return SparseMatrix(
                data=jnp.asarray(ell_data.T[:, None, None, :], dtype=dtype),
                cols=jnp.asarray(ell_cols.T),
                shape=(n_rows, n_cols),
                block=1,
                nnz=int(nnz),
            )

        if n_rows % block or n_cols % block:
            raise ValueError(
                f"matrix shape {A.shape} not divisible by block size {block}"
            )
        B = sp.bsr_matrix(sp.csr_matrix(A), blocksize=(block, block))
        B.sum_duplicates()
        nbr = n_rows // block
        counts = np.diff(B.indptr)
        K = max(int(counts.max()) if len(counts) else 1, 1)
        nblk = B.indices.shape[0]
        ell_data = np.zeros((nbr, K, block, block), dtype=np.float64)
        ell_cols = np.zeros((nbr, K), dtype=np.int32)
        rows = np.repeat(np.arange(nbr), counts)
        offs = np.arange(nblk) - np.repeat(B.indptr[:-1], counts)
        ell_data[rows, offs] = B.data
        ell_cols[rows, offs] = B.indices
        return SparseMatrix(
            data=jnp.asarray(np.transpose(ell_data, (1, 2, 3, 0)), dtype=dtype),
            cols=jnp.asarray(ell_cols.T),
            shape=(n_rows, n_cols),
            block=block,
            nnz=int(A.nnz if sp.issparse(A) else np.count_nonzero(B.data)),
        )

    def to_scipy(self) -> sp.csr_matrix:
        """Round-trip back to scipy CSR (host)."""
        K, b, _, nb = self.data.shape
        data = np.asarray(self.data)
        cols = np.asarray(self.cols)
        if b == 1:
            vals = data[:, 0, 0, :].T.ravel()  # (nb, K)
            cidx = cols.T.ravel()
            ridx = np.repeat(np.arange(nb), K)
            M = sp.coo_matrix((vals, (ridx, cidx)), shape=self.shape).tocsr()
        else:
            blocks = np.transpose(data, (3, 0, 1, 2)).reshape(-1, b, b)
            indices = cols.T.ravel()
            indptr = np.arange(nb + 1) * K
            M = sp.bsr_matrix((blocks, indices, indptr), shape=self.shape).tocsr()
        # padding entries were exact zeros: drop them
        M.eliminate_zeros()
        M.sum_duplicates()
        return M


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "shape", "nnz", "stencil_hint"],
)
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Diagonal (DIA) storage: y[i] = sum_d data[d, i] * x[i + offsets[d]].

    The TPU speed-of-light sparse format: SpMV is D shift-multiply-adds —
    full-lane VPU work with *zero gathers*.  Chosen automatically whenever
    the matrix's distinct (col - row) offset set is compact, which holds
    for structured-grid operators at every AMG level when grid-aligned
    aggregation is used (see coarsening/grid_aggregation.py).

    Entries of diagonal d exist only for rows where 0 <= i+offsets[d] < n;
    out-of-range slots hold zeros.  offsets are static Python ints so the
    shifts compile to static slices.
    """

    data: jax.Array       # (D, n)
    offsets: tuple        # (D,) static ints, sorted
    shape: tuple
    nnz: int
    # Optional host-side copy of the interior-row stencil values (same
    # order as offsets).  Assemblers that know their stencil set it so
    # setup prediction needs ZERO device programs — on tunnelled devices
    # the first mid-setup sync otherwise absorbs any compile-server
    # queue wait (measured minutes under congestion).  Verified against
    # the device absmax during setup like any prediction.
    stencil_hint: tuple | None = None

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def block(self) -> int:
        return 1

    @property
    def width(self) -> int:
        return self.data.shape[0]

    @property
    def nbytes(self) -> int:
        return self.data.size * self.data.dtype.itemsize

    def astype(self, dtype) -> "DiaMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    @staticmethod
    def from_scipy(A, dtype=jnp.float32, _analysis=None) -> "DiaMatrix":
        A = sp.csr_matrix(A)
        n, m = A.shape
        if _analysis is None:
            _analysis = _dia_analyze(A)
        uniq, didx, rows = _analysis
        if A.nnz > 1_000_000 and n < 2**31:
            # Large matrices: scatter on the device.  Index uploads are
            # cheap; a host fancy-scatter over tens of millions of
            # entries is not (and on tunnelled devices uploads are fast
            # while downloads are ~100x slower — so build device-resident
            # data from the raw triplets directly).
            data = (
                jnp.zeros((len(uniq), n), dtype=dtype)
                .at[jnp.asarray(didx.astype(np.int32)),
                    jnp.asarray(rows.astype(np.int32))]
                .set(jnp.asarray(A.data, dtype=dtype))
            )
            return DiaMatrix(
                data=data,
                offsets=tuple(int(d) for d in uniq),
                shape=(n, m),
                nnz=int(A.nnz),
            )
        data = np.zeros((len(uniq), n), dtype=np.dtype(dtype))
        # flat scatter (single pass, no float64 intermediate)
        data.reshape(-1)[didx * np.int64(n) + rows] = A.data
        return DiaMatrix(
            data=jnp.asarray(data, dtype=dtype),
            offsets=tuple(int(d) for d in uniq),
            shape=(n, m),
            nnz=int(A.nnz),
        )

    def transpose(self) -> "DiaMatrix":
        """Aᵀ analytically: offsets negate, each diagonal's data shifts by
        its offset — no sparse conversion pass (works on device data)."""
        n, m = self.shape
        new_offs = tuple(-d for d in reversed(self.offsets))
        rows = []
        for d in reversed(self.offsets):
            src = self.data[self.offsets.index(d)]
            lo = max(0, d)
            hi = min(m, n + d)
            row = jnp.zeros(m, dtype=self.data.dtype)
            if hi > lo:
                row = row.at[lo:hi].set(
                    jax.lax.slice(src, (lo - d,), (hi - d,))
                )
            rows.append(row)
        return DiaMatrix(
            data=jnp.stack(rows), offsets=new_offs, shape=(m, n),
            nnz=self.nnz,
        )

    def to_scipy(self) -> sp.csr_matrix:
        n, m = self.shape
        data = np.asarray(self.data)
        rows, cols, vals = [], [], []
        for k, d in enumerate(self.offsets):
            i = np.arange(max(0, -d), min(n, m - d))
            rows.append(i)
            cols.append(i + d)
            vals.append(data[k, i])
        M = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape,
        ).tocsr()
        M.eliminate_zeros()
        return M


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "shape", "block", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class BlockDiaMatrix:
    """Block-diagonal (block-DIA) storage: the block-value counterpart of
    `DiaMatrix`.  data[k, :, :, i] is the b×b block coupling block-row i
    to block-column i + offsets[k] (offsets in block units).

    SpMV is D shifted batched b×b block products — zero gathers, unlike
    the block-ELL path whose per-row gathers run ~60x off the HBM
    roofline on TPU.  Selected automatically for banded block matrices
    (grid elasticity, reordered mesh problems — the Serena-class
    workloads of the reference's tutorial 2, docs/tutorial/Serena.rst).
    """

    data: jax.Array       # (D, b, b, nb)
    offsets: tuple        # block-unit diagonals, sorted
    shape: tuple          # scalar (n, m)
    block: int
    nnz: int

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def width(self) -> int:
        return self.data.shape[0]

    @property
    def nbytes(self) -> int:
        return self.data.size * self.data.dtype.itemsize

    def astype(self, dtype) -> "BlockDiaMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    @staticmethod
    def from_scipy(A, block: int, dtype=jnp.float32,
                   _analysis=None) -> "BlockDiaMatrix":
        if _analysis is None:
            _analysis = _block_dia_analyze(A, block)
        B, uniq_sh, didx, rows, nb, nnz = _analysis
        data = np.zeros((len(uniq_sh), block, block, nb), dtype=np.dtype(dtype))
        data[didx, :, :, rows] = B.data
        return BlockDiaMatrix(
            data=jnp.asarray(data, dtype=dtype),
            offsets=tuple(int(d) for d in (uniq_sh - (nb - 1))),
            shape=A.shape,
            block=block,
            nnz=nnz,
        )

    def to_scipy(self) -> sp.csr_matrix:
        D, b, _, nb = self.data.shape
        data = np.asarray(self.data)
        blocks, rows, cols = [], [], []
        for k, d in enumerate(self.offsets):
            i = np.arange(max(0, -d), min(nb, nb - d))
            rows.append(i)
            cols.append(i + d)
            blocks.append(np.transpose(data[k][:, :, i], (2, 0, 1)))
        order = np.argsort(np.concatenate(rows), kind="stable")
        rows = np.concatenate(rows)[order]
        cols = np.concatenate(cols)[order]
        blocks = np.concatenate(blocks)[order]
        indptr = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=nb))])
        M = sp.bsr_matrix((blocks, cols, indptr), shape=self.shape).tocsr()
        M.eliminate_zeros()
        return M


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["d0", "c0", "tiers", "inv_perm"],
    meta_fields=["shape", "nnz", "cuts"],
)
@dataclasses.dataclass(frozen=True)
class HybridEllMatrix:
    """Tiered (hybrid) ELL for irregular row degrees — scalar matrices.

    A single ELL pads every row to the max degree K; on gather-bound
    hardware the padding is *gathered work*, so wide-tailed degree
    distributions (unstructured FEM is the reference's main workload,
    docs/tutorial/poisson3Db.rst) pay for their heaviest row everywhere.

    Rows are stored sorted by descending degree, so every tier covers a
    *contiguous prefix* of the sorted rows: tier 0 holds slots [0, k0)
    for all n rows, tier t holds its slot band for the first m_t sorted
    rows.  Tier sums combine with static slice updates (TPU scatter is
    as slow as the gathers this format removes — an earlier row-list +
    scatter-add variant measured ~8x slower than flat ELL); the single
    output gather y[inv_perm] restores original row order.  Column
    indices stay in original numbering, so x is used unpermuted.

    Plays the role of the reference's hybrid/ELL formats on GPUs
    (e.g. amgcl/backend/viennacl.hpp hyb matrices)."""

    d0: jax.Array          # (k0, n) — sorted row order
    c0: jax.Array          # (k0, n) int32
    tiers: tuple           # of (data (w, m_t), cols (w, m_t)) prefixes
    inv_perm: jax.Array    # (n,) int32: original row -> sorted position
    shape: tuple
    nnz: int
    cuts: tuple            # slot cuts (k0, k1, ..., K) for reporting

    @property
    def dtype(self):
        return self.d0.dtype

    @property
    def block(self) -> int:
        return 1

    @property
    def width(self) -> int:
        return self.d0.shape[0] + sum(t[0].shape[0] for t in self.tiers)

    @property
    def nbytes(self) -> int:
        b = self.d0.size * self.d0.dtype.itemsize + self.c0.size * 4
        b += self.inv_perm.size * 4
        for d, c in self.tiers:
            b += d.size * d.dtype.itemsize + c.size * 4
        return b

    def astype(self, dtype) -> "HybridEllMatrix":
        return dataclasses.replace(
            self,
            d0=self.d0.astype(dtype),
            tiers=tuple((d.astype(dtype), c) for d, c in self.tiers),
        )

    @staticmethod
    def from_scipy(A, dtype=jnp.float32, quantiles=(50, 90)
                   ) -> "HybridEllMatrix":
        A = sp.csr_matrix(A)
        if not A.has_canonical_format:
            A = A.copy()
            A.sum_duplicates()
        n, m = A.shape
        counts = np.diff(A.indptr)
        K = max(int(counts.max()) if n else 1, 1)
        cuts = sorted({max(1, int(np.percentile(counts, q)))
                       for q in quantiles} | {K})
        cuts = [c for c in cuts if c <= K]
        if cuts[-1] != K:
            cuts.append(K)

        # stable sort by descending degree: tiers are sorted-row prefixes
        order = np.argsort(-counts, kind="stable").astype(np.int64)
        inv = np.empty(n, np.int32)
        inv[order] = np.arange(n, dtype=np.int32)
        counts_s = counts[order]

        rows_all = inv[np.repeat(np.arange(n), counts)]
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)

        def band(lo, hi, mrows):
            mask = (offs >= lo) & (offs < hi)
            r = rows_all[mask]          # sorted positions, all < mrows
            d = np.zeros((mrows, hi - lo), dtype=np.float64)
            c = np.zeros((mrows, hi - lo), dtype=np.int32)
            d[r, offs[mask] - lo] = A.data[mask]
            c[r, offs[mask] - lo] = A.indices[mask]
            return d.T, c.T

        d0, c0 = band(0, cuts[0], n)
        tiers = []
        lo = cuts[0]
        for hi in cuts[1:]:
            mrows = int((counts_s > lo).sum())
            if mrows == 0:
                lo = hi
                continue
            d, c = band(lo, hi, mrows)
            tiers.append((jnp.asarray(d, dtype=dtype), jnp.asarray(c)))
            lo = hi
        return HybridEllMatrix(
            d0=jnp.asarray(d0, dtype=dtype),
            c0=jnp.asarray(c0),
            tiers=tuple(tiers),
            inv_perm=jnp.asarray(inv),
            shape=(n, m),
            nnz=int(A.nnz),
            cuts=tuple(cuts),
        )

    def to_scipy(self) -> sp.csr_matrix:
        n, m = self.shape
        inv = np.asarray(self.inv_perm)          # original -> sorted pos
        order = np.empty(n, np.int64)
        order[inv] = np.arange(n)                # sorted pos -> original
        rows, cols, vals = [], [], []
        k0 = self.d0.shape[0]
        rows.append(np.repeat(order, k0))
        cols.append(np.asarray(self.c0).T.ravel())
        vals.append(np.asarray(self.d0).T.ravel())
        for d, c in self.tiers:
            w, mt = d.shape
            rows.append(np.repeat(order[:mt], w))
            cols.append(np.asarray(c).T.ravel())
            vals.append(np.asarray(d).T.ravel())
        M = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape,
        ).tocsr()
        M.eliminate_zeros()
        M.sum_duplicates()
        return M

    @property
    def gathered_elements(self) -> int:
        return self.d0.size + sum(t[0].size for t in self.tiers)


def _block_dia_analyze(A, block: int):
    """One pass over the block pattern: (bsr, unique shifted offsets,
    per-block diag index, per-block row, nb, scalar nnz)."""
    A_csr = sp.csr_matrix(A)
    B = sp.bsr_matrix(A_csr, blocksize=(block, block))
    B.sum_duplicates()
    nb = B.shape[0] // block
    rows = np.repeat(np.arange(nb, dtype=np.int64), np.diff(B.indptr))
    shifted = (B.indices.astype(np.int64) - rows) + (nb - 1)
    cnt = np.bincount(shifted, minlength=max(2 * nb - 1, 1))
    uniq_sh = np.flatnonzero(cnt)
    didx = np.searchsorted(uniq_sh, shifted)
    return B, uniq_sh, didx, rows, nb, int(A_csr.nnz)


def block_dia_viable(A, block: int, max_diags: int | None = None,
                     _analysis=None) -> bool:
    """Block-offset pattern compactness check (analogue of dia_viable).
    Square operators only — the block-DIA spmv views x by the row block
    count, so rectangular transfers must stay in ELL."""
    if A.shape[0] != A.shape[1]:
        return False
    if _analysis is None:
        _analysis = _block_dia_analyze(A, block)
    B, uniq_sh, didx, rows, nb, _ = _analysis
    if nb == 0 or B.nnz == 0:
        return False
    K = int(np.diff(B.indptr).max())
    if max_diags is None:
        max_diags = max(48, 3 * K)
    return len(uniq_sh) <= max_diags


def _dia_analyze(A: sp.csr_matrix):
    """One pass over the pattern: (unique offsets, per-nnz diag index,
    per-nnz row).  Offsets live in [-(n-1), m-1], so the unique set comes
    from a bincount + flatnonzero (O(nnz + n + m)) instead of a full sort
    — np.unique over tens of millions of entries dominates setup
    otherwise."""
    n, m = A.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    offs = A.indices.astype(np.int64) - rows
    shifted = offs + (n - 1)                  # in [0, n+m-2]
    cnt = np.bincount(shifted, minlength=n + m - 1)
    uniq_sh = np.flatnonzero(cnt)
    uniq = uniq_sh - (n - 1)
    didx = np.searchsorted(uniq_sh, shifted)
    return uniq, didx, rows


def dia_viable(A, max_diags: int | None = None) -> bool:
    """Heuristic: DIA wins whenever the distinct-offset count is within a
    small factor of the max row width (gathers are catastrophically slower
    than the extra zero-padded lanes)."""
    A = sp.csr_matrix(A)
    if A.shape[0] == 0 or A.nnz == 0:
        return False
    uniq, _, _ = _dia_analyze(A)
    K = int(np.diff(A.indptr).max())
    if max_diags is None:
        max_diags = max(48, 3 * K)
    return len(uniq) <= max_diags


def from_scipy_auto(A, block: int = 1, dtype=jnp.float32, max_diags=None,
                    format: str = "auto"):
    """Pick the fastest device format for this matrix (DIA when compact,
    tiered ELL for irregular scalar degrees, block-ELL otherwise).
    format='dia'/'ell'/'hybrid' forces; 'auto' analyzes the offset
    pattern once and reuses the analysis for the conversion."""
    if format == "dia" or (format == "auto" and block == 1):
        A = sp.csr_matrix(A)
        if A.shape[0] and A.nnz:
            analysis = _dia_analyze(A)
            uniq = analysis[0]
            K = int(np.diff(A.indptr).max())
            limit = max_diags if max_diags is not None else max(48, 3 * K)
            if format == "dia" or len(uniq) <= limit:
                return DiaMatrix.from_scipy(A, dtype=dtype, _analysis=analysis)
    if block > 1 and format in ("auto", "block_dia") \
            and A.shape[0] == A.shape[1]:
        A = sp.csr_matrix(A)
        if A.shape[0] and A.nnz:
            analysis = _block_dia_analyze(A, block)
            if format == "block_dia" or block_dia_viable(
                A, block, max_diags, _analysis=analysis
            ):
                return BlockDiaMatrix.from_scipy(
                    A, block=block, dtype=dtype, _analysis=analysis
                )
    if block == 1 and format in ("auto", "sell", "sell_f64"):
        # On TPU backends the windowed-gather Pallas kernel (SELL) is
        # ~12x faster than any XLA-gather format for unstructured
        # patterns (XLA gathers serialize at ~0.14 Gelem/s on chip);
        # f32/bf16 only (Mosaic has no 64-bit vectors).
        try:
            on_tpu = jax.default_backend() != "cpu"
        except Exception:
            on_tpu = False
        if (format == "sell" or on_tpu) and jnp.dtype(dtype) in (
            jnp.float32, jnp.bfloat16
        ):
            from .pallas_sell import SellMatrix
            from .pallas_sell2 import Sell2Matrix

            A = sp.csr_matrix(A)
            if A.shape[0] and A.nnz:
                # AMGCL_TPU_SELL=1 pins the v1 kernel (escape hatch)
                if os.environ.get("AMGCL_TPU_SELL") == "1":
                    S = SellMatrix.from_scipy(A, dtype=dtype)
                else:
                    S = Sell2Matrix.from_scipy(A, dtype=dtype)
                    if S is None:
                        S = SellMatrix.from_scipy(A, dtype=dtype)
                if S is not None:
                    return S
                if format == "sell":
                    raise ValueError(
                        "matrix needs too many gather windows for the "
                        "SELL kernel; reorder (Cuthill-McKee) first"
                    )
        if (format == "sell_f64" or on_tpu) and jnp.dtype(dtype) \
                == jnp.float64 and format in ("auto", "sell_f64"):
            # f64 unstructured operators (refine's outer defect SpMV, f64
            # hierarchies): double-f32 compensated SELL kernel instead of
            # the serialized XLA gather path (Mosaic has no 64-bit
            # vectors).
            from .pallas_sell2 import Sell2F64Matrix

            A = sp.csr_matrix(A)
            if A.shape[0] and A.nnz:
                S = Sell2F64Matrix.from_scipy(A)
                if S is not None:
                    return S
                if format == "sell_f64":
                    raise ValueError(
                        "matrix needs too many gather windows for the "
                        "SELL kernel; reorder (Cuthill-McKee) first"
                    )
    if block > 1 and jnp.dtype(dtype) == jnp.float64 \
            and format in ("auto", "sell_f64"):
        # f64 *block* operators (the Serena-class outer operator in an
        # f64 Krylov loop): the scalar double-f32 SELL view is
        # mathematically identical for SpMV and still far ahead of the
        # serialized-gather block-ELL path.  The f32 hierarchy keeps the
        # block kernel (windows on the block graph are much cheaper).
        try:
            on_tpu = jax.default_backend() != "cpu"
        except Exception:
            on_tpu = False
        if format == "sell_f64" or on_tpu:
            from .pallas_sell2 import Sell2F64Matrix

            A = sp.csr_matrix(A)
            if A.shape[0] and A.nnz:
                S = Sell2F64Matrix.from_scipy(A)
                if S is not None:
                    return S
    if block > 1 and format in ("auto", "bsell"):
        # Unstructured block (BSR) operators — the Serena/CoupCons3D
        # class (reference: amgcl/backend/vexcl_static_matrix.hpp:1).
        # The block SELL kernel gathers once per source component and
        # reuses it for all b destination rows, so it is even further
        # ahead of the XLA-gather block-ELL path than the scalar SELL.
        try:
            on_tpu = jax.default_backend() != "cpu"
        except Exception:
            on_tpu = False
        if (format == "bsell" or on_tpu) and jnp.dtype(dtype) in (
            jnp.float32, jnp.bfloat16, jnp.float64,
        ):
            from .pallas_bsell import BlockSellMatrix

            kdt = dtype
            if format != "bsell" and jnp.dtype(dtype) == jnp.float64:
                # Mosaic has no 64-bit vectors; auto-selection keeps the
                # requested f64 only when explicitly forced (CPU path).
                kdt = None
            if kdt is not None:
                S = BlockSellMatrix.from_scipy(A, block=block, dtype=kdt)
                if S is not None:
                    return S
                if format == "bsell":
                    raise ValueError(
                        "block pattern needs too many gather windows for "
                        "the block SELL kernel; reorder (Cuthill-McKee) "
                        "first"
                    )
    if block == 1 and format in ("auto", "hybrid"):
        A = sp.csr_matrix(A)
        if A.shape[0] and A.nnz:
            counts = np.diff(A.indptr)
            K = int(counts.max())
            k0 = max(1, int(np.percentile(counts, 50)))
            k1 = max(k0, int(np.percentile(counts, 90)))
            est = (
                k0 * A.shape[0]
                + (k1 - k0) * int((counts > k0).sum())
                + (K - k1) * int((counts > k1).sum())
            )
            # the tiers only pay off when they remove a real share of the
            # gathered elements (gathers dominate the ELL SpMV on TPU)
            if format == "hybrid" or est <= 0.75 * K * A.shape[0]:
                return HybridEllMatrix.from_scipy(A, dtype=dtype)
    return SparseMatrix.from_scipy(A, block=block, dtype=dtype)


def diagonal(A) -> jax.Array:
    """Extract the (block-)diagonal as a dense array.

    Returns shape (nb, b, b) for block matrices, or (n,) for scalar.
    Analogue of backend::diagonal (reference: amgcl/backend/builtin.hpp:753).
    """
    if isinstance(A, DiaMatrix):
        if 0 in A.offsets:
            return A.data[A.offsets.index(0)]
        return jnp.zeros(A.shape[0], dtype=A.dtype)
    if isinstance(A, BlockDiaMatrix):
        nb = A.shape[0] // A.block
        if 0 in A.offsets:
            return jnp.transpose(A.data[A.offsets.index(0)], (2, 0, 1))
        return jnp.zeros((nb, A.block, A.block), dtype=A.dtype)
    if isinstance(A, HybridEllMatrix):
        n = A.shape[0]
        # original row index of each sorted position
        orig = jnp.zeros(n, jnp.int32).at[A.inv_perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        dia = jnp.sum(jnp.where(A.c0 == orig[None, :], A.d0, 0.0), axis=0)
        for d, c in A.tiers:
            mt = d.shape[1]
            hit = c == orig[None, :mt]
            dia = dia.at[:mt].add(jnp.sum(jnp.where(hit, d, 0.0), axis=0))
        return dia[A.inv_perm]
    K, b, _, nb = A.data.shape
    rows = jnp.arange(nb)
    is_dia = (A.cols == rows[None, :])  # (K, nb)
    dia = jnp.einsum("kn,kabn->nab", is_dia.astype(A.data.dtype), A.data)
    if b == 1:
        return dia[:, 0, 0]
    return dia
