"""Device-side AMG setup for *general* (unstructured) matrices.

The structured fast path (precond/grid_setup.py) probes grid operators;
this builder covers everything else on device: PMIS aggregation,
smoothed prolongation, and the sort-based Galerkin RAP all run as XLA
programs on the planar-ELL level matrices (coarsening/device_setup.py).
The host orchestrates shapes only — per level it fetches three scalars
(aggregate count, max row width, nnz) and never an nnz-sized array
(reference counterpart: the CPU setup loop of amgcl/amg.hpp:467-500 +
detail/spgemm.hpp:62, redesigned for a machine where the matrix already
lives in device memory).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.formats import SparseMatrix
from .amg import Level, AMGParams
from .. import relaxation as rlx
from ..coarsening.device_setup import (
    pmis_ids_device, smoothed_prolongation_ell,
    spgemm_ap_device, spgemm_ptb_device, _terms_to_ell, _ell_diagonal,
    expand_block_ell, condense_scalar_ell, expand_block_ids,
    block_strong_scalar,
)


class EmptyLevelError(RuntimeError):
    pass


def _round8(x):
    return max(8, int(-(-x // 8) * 8))


# sort-stage peak-memory bound (elements); tests shrink it to force the
# chunked path
_TERM_CAP = 48_000_000


def _chunks(n, nch):
    """Equal-size row chunks (last one short)."""
    size = -(-n // nch)
    return [slice(i, min(i + size, n)) for i in range(0, n, size)]


# ---- shape bucketing -------------------------------------------------
# Every distinct (shape, static-bound) tuple is a separate XLA program,
# and on tunnelled devices each big-sort compile costs ~45 s+.  All
# widths/bounds/chunk sizes are therefore bucketed to powers of two
# (min 8) and row chunks padded to one fixed size, so the expensive sort
# programs are REUSED across chunks, retries and levels.

def _pow2_8(x: int) -> int:
    b = 8
    while b < x:
        b *= 2
    return b


def _pad_ell_width(data, cols, Kb):
    """Pad ELL width with zero-valued slots whose column duplicates the
    row's slot-0 column: padded product terms land on keys that already
    exist, merging as +0 — the sort-width bounds do not inflate."""
    K = data.shape[0]
    if Kb == K:
        return data, cols
    pd = jnp.zeros((Kb - K, data.shape[1]), data.dtype)
    pc = jnp.broadcast_to(cols[0:1], (Kb - K, cols.shape[1]))
    return jnp.concatenate([data, pd]), jnp.concatenate([cols, pc])


def _pad_ell_rows(data, cols, size):
    """Pad the row axis with zero rows (col 0, val 0)."""
    n = data.shape[1]
    if size == n:
        return data, cols
    pd = jnp.zeros((data.shape[0], size - n), data.dtype)
    pc = jnp.zeros((cols.shape[0], size - n), cols.dtype)
    return (
        jnp.concatenate([data, pd], axis=1),
        jnp.concatenate([cols, pc], axis=1),
    )


@partial(jax.jit, static_argnames=("nc", "kc"))
def _merge2_ell(d1, c1, d2, c2, nc, kc):
    """Sum two partial Ac ELLs through one sort/segment pass."""
    rows = jnp.broadcast_to(
        jnp.arange(nc, dtype=jnp.int32)[None, :], (kc, nc)
    ).reshape(-1)
    return _terms_to_ell(
        jnp.concatenate([rows, rows]),
        jnp.concatenate([c1.reshape(-1), c2.reshape(-1)]),
        jnp.concatenate([d1.reshape(-1), d2.reshape(-1)]),
        nc, kc,
    )


def _merge_partial_ell(parts, nc, kc):
    """Sum per-chunk partial Ac ELLs (disjoint fine-row contributions to
    the same coarse rows) by pairwise tree reduction.  One flat sort over
    all chunks at once materializes n_chunks * kc * nc slots (observed
    20 GB HBM at 150k dof); the pairwise merge keeps every step at
    2 * kc * nc with ONE compiled program reused across the whole tree.
    Intermediate widths never exceed the final union's width, so the
    caller's kc-bound check on the final result remains sufficient."""
    parts = list(parts)
    kmax = nnz = None
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            d_, c_, km, nnz = _merge2_ell(
                parts[i][0], parts[i][1],
                parts[i + 1][0], parts[i + 1][1], nc, kc,
            )
            # a truncated INTERMEDIATE merge would make the final width
            # report unreliable — the retry check needs the max over
            # every merge in the tree
            kmax = km if kmax is None else jnp.maximum(kmax, km)
            nxt.append((d_, c_))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
        # Once any merge truncated (km > kc) the final result will be
        # discarded and the caller retries at a wider kc — stop burning
        # the remaining merges.  One scalar fetch per tree level (log2
        # chunks), after that level's independent merges all dispatched.
        # Only in eager callers: under a trace (dist_setup's shard_map)
        # kmax is abstract and the tree must run to completion.
        if (
            len(parts) > 1
            and not isinstance(kmax, jax.core.Tracer)
            and int(kmax) > kc
        ):
            return parts[0][0], parts[0][1], kmax, nnz
    d_, c_ = parts[0]
    if kmax is None:                       # single part: width known good
        kmax = jnp.asarray(kc, jnp.int32)
        nnz = jnp.asarray(0, jnp.int32)
    return d_, c_, kmax, nnz


@partial(jax.jit, static_argnames=("nc", "kr_bound"))
def _transpose_ell(P_data, P_cols, nc, kr_bound):
    """R = Pᵀ in planar ELL via the shared sort/segment machinery."""
    K, n = P_data.shape
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], P_cols.shape
    )
    return _terms_to_ell(
        P_cols.reshape(-1), rows.reshape(-1), P_data.reshape(-1),
        nc, kr_bound,
    )


@jax.jit
def _spai0_ell(data, cols):
    dia = _ell_diagonal(data, cols)
    row_sq = jnp.sum(data * data, axis=0)
    return jnp.where(
        row_sq > 0, dia / jnp.where(row_sq == 0, 1.0, row_sq), 1.0
    )


@jax.jit
def _jacobi_ell(data, cols):
    dia = _ell_diagonal(data, cols)
    return 1.0 / jnp.where(dia != 0, dia, 1.0)


def _ell_relax_state(relaxation, data, cols, A_sp):
    from ..relaxation.spai0 import SPAI0, SPAI0State
    from ..relaxation.damped_jacobi import DampedJacobi, JacobiState
    from ..relaxation.chebyshev import Chebyshev, ChebyshevState

    if isinstance(relaxation, SPAI0):
        return SPAI0State(m=_spai0_ell(data, cols))
    if isinstance(relaxation, DampedJacobi):
        return JacobiState(
            inv_dia=_jacobi_ell(data, cols),
            damping=jnp.asarray(relaxation.damping, data.dtype),
        )
    if isinstance(relaxation, Chebyshev) and not relaxation.scale:
        rho = jnp.max(jnp.sum(jnp.abs(data), axis=0))
        lo = rho * relaxation.lower
        hi = rho * relaxation.higher
        return ChebyshevState(
            c=((hi - lo) / 2).astype(data.dtype),
            d=((hi + lo) / 2).astype(data.dtype),
            inv_dia=jnp.ones(1, data.dtype),
            degree=relaxation.degree,
            scale=False,
        )
    # generic fallback pulls the level to the host — slow on tunnelled
    # devices, correct everywhere
    A_host = A_sp.to_scipy()
    return relaxation.setup(A_host, A_sp)


def _dense_inverse_ell(data, cols, n):
    @jax.jit
    def inv(data, cols):
        flat = (
            jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], cols.shape
            ).astype(jnp.int64) * n + cols.astype(jnp.int64)
        )
        inv_dt = (
            jnp.float64 if jax.default_backend() == "cpu" else data.dtype
        )
        dense = (
            jnp.zeros(n * n, dtype=inv_dt)
            .at[flat.reshape(-1)]
            .add(data.astype(inv_dt).reshape(-1))
            .reshape(n, n)
        )
        return jnp.linalg.inv(dense).astype(data.dtype)

    return inv(data, cols)


def _wrap(data, cols, shape, nnz):
    return SparseMatrix(
        data=data[:, None, None, :], cols=cols, shape=shape, block=1,
        nnz=int(nnz),
    )


def _condense_chunked(data, cols, b, stats):
    """Condensed block graph C[I,J] = ||A_IJ||_F from scalar ELL planes,
    row-chunked like the RAP so the sort-stage peak memory stays
    bounded.  Chunks are block-aligned (multiples of b scalar rows), so
    every block row lives in exactly one chunk and the per-chunk ELL
    pieces concatenate without a re-merge."""
    K, n = data.shape
    nb = n // b
    Kb = _pow2_8(K)
    d, c = _pad_ell_width(data, cols, Kb)
    CH = max(1024, _TERM_CAP // Kb)              # scalar rows per chunk
    CH = 1 << (CH.bit_length() - 1)
    CH = max(b, (CH // b) * b)
    if CH >= n:
        CH = _pow2_8(-(-n // b)) * b
    nch = -(-n // CH)
    dp, cp = _pad_ell_rows(d, c, nch * CH)
    kc = _pow2_8(K + 8)
    while True:
        parts = []
        kmax_all = 0
        for sl in _chunks(nch * CH, nch):
            Cd_, Cc_, kmax, _ = condense_scalar_ell(
                dp[:, sl], cp[:, sl], b, kc
            )
            parts.append((Cd_, Cc_))
            kmax_all = max(kmax_all, int(kmax))
        if kmax_all <= kc:
            break
        stats["retries"] += 1
        kc = _pow2_8(kmax_all)
    Cd = jnp.concatenate([p[0] for p in parts], axis=1)[:, :nb]
    Cc = jnp.concatenate([p[1] for p in parts], axis=1)[:, :nb]
    return Cd, Cc


def build_ell_hierarchy(
    A: SparseMatrix,
    *,
    params: AMGParams | None = None,
    relaxation=None,
    eps_strong: float = 0.08,
    relax_factor: float = 1.0,
    seed: int = 42,
    dtype=jnp.float32,
    setup_stats: dict | None = None,
    block: int = 1,
):
    """Build the hierarchy on device from a planar-ELL fine matrix.

    Width bounds for the sparse products start at a heuristic and retry
    with the exact width on overflow (the overflow is detected from the
    returned kmax scalar, and the retried program is the only recompile).

    ``block > 1`` switches aggregation to the block-aligned variant (the
    reference's block-value setup, coarsening/smoothed_aggregation.hpp
    with math::norm over b×b blocks): strength and PMIS run on the
    condensed block-Frobenius graph, the tentative prolongation is the
    component-preserving block identity, and the filter keeps whole
    strong blocks — so every level stays block-aligned (coarse unknown
    = aggregate·b + component) while the RAP itself runs on the scalar
    expansion, unchanged.
    """
    import time as _t

    prm = params or AMGParams()
    relaxation = relaxation or rlx.SPAI0()
    stats = setup_stats if setup_stats is not None else {}
    stats.setdefault("retries", 0)
    stats.setdefault("phase_s", {})

    def _mark(tag, t0, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        stats["phase_s"][tag] = (
            stats["phase_s"].get(tag, 0.0) + _t.perf_counter() - t0
        )
        return _t.perf_counter()

    levels = []
    eps = eps_strong

    A_cur = A.astype(dtype)
    while (
        len(levels) < prm.max_levels
        and A_cur.shape[0] > prm.coarse_enough
    ):
        data = A_cur.data[:, 0, 0, :]
        cols = A_cur.cols
        K, n = data.shape
        omega = relax_factor * 2.0 / 3.0

        t0 = _t.perf_counter()
        if block > 1:
            # block-aligned aggregation: strength + PMIS run on the
            # condensed block-Frobenius graph; ids/strength expand back
            # to the scalar planes (see _condense_chunked below)
            Cd, Cc = _condense_chunked(data, cols, block, stats)
            ids_b, count_b, strong_b = pmis_ids_device(
                Cd, Cc, jnp.asarray(eps * eps, Cd.dtype), seed
            )
            nc = int(count_b) * block        # scalar fetch
            ids = expand_block_ids(ids_b, block)
            strong = block_strong_scalar(data, cols, Cc, strong_b, block)
        else:
            ids, count, strong = pmis_ids_device(
                data, cols, jnp.asarray(eps * eps, data.dtype), seed
            )
            nc = int(count)                  # scalar fetch
        t0 = _mark("pmis", t0)
        if nc == 0:
            raise EmptyLevelError("no aggregates could be formed")
        if nc >= n:
            break                            # coarsening stalled

        P_data, P_cols = smoothed_prolongation_ell(
            data, cols, ids, strong, omega
        )
        # Compress P to its true row width before the products: the
        # positional construction is (K+1)-wide but smoothed-P rows only
        # touch a handful of aggregates, and AP/RAP term counts scale
        # with the PADDED width (the block-expanded elasticity path was
        # sorting 16x more terms than exist).  One cheap extra sort.
        kp = 16
        while True:
            rowsP = jnp.broadcast_to(
                jnp.arange(P_data.shape[1], dtype=jnp.int32)[None, :],
                P_cols.shape,
            )
            Pd2, Pc2, kmax_p, nnz_p = _terms_to_ell(
                rowsP.reshape(-1), P_cols.reshape(-1),
                P_data.reshape(-1), n, kp,
            )
            if int(kmax_p) <= kp:
                break
            stats["retries"] += 1
            kp = _pow2_8(int(kmax_p))
        P_data, P_cols = Pd2, Pc2

        # Fine-row chunking bounds the sort-stage peak memory: each
        # chunk's product terms are expanded, sorted and compressed
        # independently; AP chunks concatenate by rows, Ac chunks
        # re-merge through one final (much smaller) sort.  Widths and
        # chunk sizes are power-of-two-bucketed and padded so the sort
        # programs are shared across chunks/retries/levels (see
        # _pow2_8 above).
        TERM_CAP = _TERM_CAP

        Kb = _pow2_8(K)
        Kpb = P_data.shape[0]                # compressed, already pow2_8
        nc_b = _pow2_8(nc)
        dA, cA = _pad_ell_width(data, cols, Kb)
        dP, cP = P_data, P_cols

        kap = _pow2_8(K + 9)
        while True:
            CH = max(1024, _TERM_CAP // max(Kb * Kpb, 1))
            CH = 1 << (CH.bit_length() - 1)              # pow2 floor
            if CH >= n:
                CH = _pow2_8(n)
            nch = -(-n // CH)
            dAp, cAp = _pad_ell_rows(dA, cA, nch * CH)
            AP_parts = []
            kmax_all = 0
            for sl in _chunks(nch * CH, nch):
                # A rows are sliced; P stays full (its rows are gathered
                # by A's *global* column indices)
                d_, c_, kmax, _ = spgemm_ap_device(
                    dAp[:, sl], cAp[:, sl], dP, cP, kap
                )
                AP_parts.append((d_, c_))
                kmax_all = max(kmax_all, int(kmax))
            if kmax_all <= kap:
                break
            stats["retries"] += 1
            kap = _pow2_8(kmax_all)
        AP_d = jnp.concatenate([p[0] for p in AP_parts], axis=1)[:, :n]
        AP_c = jnp.concatenate([p[1] for p in AP_parts], axis=1)[:, :n]
        # _terms_to_ell packs each row's entries from slot 0, so slicing
        # to the true max width is free compression for the RAP below
        kb_eff = _pow2_8(max(kmax_all, 8))
        if kb_eff < kap:
            AP_d = AP_d[:kb_eff]
            AP_c = AP_c[:kb_eff]
        t0 = _mark("ap", t0, AP_d)

        kc = _pow2_8(4 * K)
        while True:
            CH = max(1024, _TERM_CAP // max(Kpb * kb_eff, 1))
            CH = 1 << (CH.bit_length() - 1)
            if CH >= n:
                CH = _pow2_8(n)
            nch = -(-n // CH)
            dPp, cPp = _pad_ell_rows(dP, cP, nch * CH)
            dB, cB = _pad_ell_rows(AP_d, AP_c, nch * CH)
            parts = []
            ok = True
            for sl in _chunks(nch * CH, nch):
                d_, c_, kmax_c, nnz_c = spgemm_ptb_device(
                    dPp[:, sl], cPp[:, sl], dB[:, sl], cB[:, sl],
                    nc_b, kc
                )
                if int(kmax_c) > kc:
                    ok = False
                    break
                parts.append((d_, c_))
            if ok and len(parts) > 1:
                Ac_d, Ac_c, kmax_c, nnz_c = _merge_partial_ell(
                    parts, nc_b, kc
                )
                ok = int(kmax_c) <= kc
            elif ok:
                Ac_d, Ac_c = parts[0]
            if ok:
                break
            stats["retries"] += 1
            kc = _pow2_8(max(int(kmax_c), kc + 8))
        Ac_d = Ac_d[:, :nc]
        Ac_c = jnp.minimum(Ac_c[:, :nc], nc - 1)
        t0 = _mark("rap", t0, Ac_d)

        kr = _pow2_8(3 * (K + 1))
        while True:
            R_d, R_c, kmax_r, nnz_r = _transpose_ell(dP, cP, nc_b, kr)
            if int(kmax_r) <= kr:
                break
            stats["retries"] += 1
            kr = _pow2_8(int(kmax_r))
        R_d = R_d[:, :nc]
        R_c = R_c[:, :nc]
        t0 = _mark("transpose", t0, R_d)

        P_sp = _wrap(P_data, P_cols, (n, nc), int(nnz_r))
        R_sp = _wrap(R_d, R_c, (nc, n), int(nnz_r))
        relax_state = _ell_relax_state(relaxation, data, cols, A_cur)
        levels.append(
            Level(A=A_cur, P=P_sp, R=R_sp, relax=relax_state,
                  coarse_inv=None)
        )
        A_cur = _wrap(Ac_d, Ac_c, (nc, nc), int(nnz_c))
        eps *= 0.5

    n = A_cur.shape[0]
    coarse_inv = _dense_inverse_ell(
        A_cur.data[:, 0, 0, :], A_cur.cols, n
    )
    levels.append(
        Level(A=A_cur, P=None, R=None, relax=None, coarse_inv=coarse_inv)
    )
    return tuple(levels), prm


class DeviceGeneralAMG:
    """AMG with the general (PMIS + sort-RAP) hierarchy built on-device —
    the unstructured counterpart of GridAMG.

    The device PMIS assumes a structurally symmetric sparsity pattern
    (see coarsening.device_setup.pmis_ids_device); for one-sided patterns
    pre-symmetrize (A + A^T pattern) or use the host setup path."""

    def __init__(
        self,
        A,
        *,
        relaxation=None,
        params: AMGParams | None = None,
        dtype=jnp.float32,
        eps_strong: float = 0.08,
        relax_factor: float = 1.0,
        seed: int = 42,
        block: int = 1,
        level0_A=None,
    ):
        """``block > 1`` (or a block-valued ``A``) builds the hierarchy
        with block-aligned aggregation (strength/PMIS on the condensed
        block-Frobenius graph — the reference's block-value setup role,
        value_type/static_matrix.hpp + coarsening/smoothed_aggregation.hpp).
        ``level0_A`` optionally substitutes a faster device format
        (BlockDia/BlockSell) for the finest-level operator; the scalar
        ELL expansion is used for the setup math only."""
        if not isinstance(A, SparseMatrix):
            from ..ops.formats import SparseMatrix as SM
            A = SM.from_scipy(A, block=block, dtype=dtype)
        b = A.block
        if b > 1:
            if level0_A is None:
                level0_A = A.astype(dtype)
            Ab = A.astype(dtype)
            d_sc, c_sc = expand_block_ell(Ab.data, Ab.cols, b)
            A = SparseMatrix(
                data=d_sc[:, None, None, :], cols=c_sc,
                shape=Ab.shape, block=1, nnz=Ab.nnz,
            )
        self.dtype = dtype
        self.relaxation = relaxation or rlx.SPAI0()
        self.setup_stats = {}
        self.levels, self.prm = build_ell_hierarchy(
            A, params=params, relaxation=self.relaxation,
            eps_strong=eps_strong, relax_factor=relax_factor, seed=seed,
            dtype=dtype, setup_stats=self.setup_stats, block=b,
        )
        if level0_A is not None and self.levels[0].P is not None:
            self.levels = (
                dataclasses.replace(self.levels[0], A=level0_A),
            ) + self.levels[1:]

    def apply(self, r):
        from .amg import amg_apply

        return amg_apply(self.levels, r, self.prm)

    def system_matrix(self):
        return self.levels[0].A

    def __call__(self, r):
        return self.apply(r)

    def __repr__(self):
        from ..utils.report import hierarchy_report

        return hierarchy_report(self)
