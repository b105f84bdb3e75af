"""On-device general (unstructured) AMG setup.

The reference always builds on the CPU (amgcl/amg.hpp:355-360; SpGEMM in
amgcl/detail/spgemm.hpp:62, PMIS in amgcl/mpi/coarsening/pmis.hpp:50).
This module runs the smoothed-aggregation setup pipeline for *arbitrary*
sparsity on the TPU:

* strength of connection — elementwise on the planar ELL data;
* aggregation — a PMIS distance-2 independent-set sweep as a jittable
  `lax.while_loop` of scatter-max rounds (the data-parallel algorithm
  family the reference uses for its distributed coarsening);
* tentative + Jacobi-smoothed prolongation — P inherits A's ELL layout
  with aggregate-remapped columns (duplicate columns allowed: SpMV and
  the RAP compression sum them);
* Galerkin RAP — term expansion → sort by (row, col) key → segment sum
  → planar ELL: the sort-based SpGEMM that replaces the reference's
  marker-array loops on a machine without scalar hash loops
  (SURVEY §7 "hard parts" plan, executed).

Device↔host traffic per level: a handful of scalars (aggregate count,
max coarse row width, nnz) — never an nnz-sized array.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp




# ----------------------------------------------------------------------
# strength + PMIS aggregation (jittable)
# ----------------------------------------------------------------------

def _ell_diagonal(data, cols):
    rows = jnp.arange(data.shape[1], dtype=jnp.int32)
    return jnp.sum(jnp.where(cols == rows[None, :], data, 0.0), axis=0)


def _strength_ell(data, cols, eps2):
    """Strong-connection mask on planar ELL (reference semantics
    a_ij² > eps² a_ii a_jj, coarsening/plain_aggregates.hpp:87-104);
    padding entries (value 0) are never strong."""
    rows = jnp.arange(data.shape[1], dtype=jnp.int32)
    dia = _ell_diagonal(data, cols)
    off = (cols != rows[None, :]) & (data != 0)
    return off & (
        data * data > eps2 * jnp.abs(dia)[None, :] * jnp.abs(dia[cols])
    )


@partial(jax.jit, static_argnames=("max_rounds",))
def pmis_ids_device(data, cols, eps2, seed, max_rounds=64):
    """Jittable PMIS distance-2 aggregation over the ELL strength graph.

    Returns (ids, count, strong): ids[i] ∈ [0, count) is i's aggregate,
    or -2 for removed (lonely) nodes; ids are coarse-numbered already.
    Weights are a deterministic seeded hash (reproducible, like the host
    pmis_aggregates).

    REQUIRES a structurally symmetric strength pattern: nbr_max takes the
    distance-2 max over *out*-neighbors only (the in-neighbor scatter-max
    serializes on TPU; dropping it cut a PMIS round ~2x), and the 1-hop
    join relies on the same symmetry.  With a nonsymmetric pattern two
    nodes within distance 2 via in-edges can both root — still a valid
    aggregation (correctness is unaffected), just coarser-quality.  SA
    targets symmetric-pattern problems; for genuinely one-sided patterns
    symmetrize A's pattern (A + A^T) before calling, as the host path's
    plain aggregation does."""
    K, n = data.shape
    UNDEF = jnp.int32(-1)
    REMOVED = jnp.int32(-2)
    strong = _strength_ell(data, cols, eps2)             # (K, n)
    rows = jnp.arange(n, dtype=jnp.int32)
    scols = jnp.where(strong, cols, 0)                   # safe gather idx

    has_strong = jnp.any(strong, axis=0)
    has_in = (
        jnp.zeros(n, dtype=bool)
        .at[scols.reshape(-1)]
        .max(strong.reshape(-1))
    )
    live0 = has_strong | has_in
    ids0 = jnp.where(live0, UNDEF, REMOVED)

    # deterministic unique weights: hash in high bits, index tiebreak low
    h = (rows.astype(jnp.uint32) * jnp.uint32(2654435761)
         ^ (jnp.uint32(seed) * jnp.uint32(0x9E3779B9)))
    h = h ^ (h >> 16)
    w = ((h.astype(jnp.int64) & jnp.int64(0x7FFFFFFF)) << 32) \
        | rows.astype(jnp.int64)
    w = w + 1                                            # > 0

    def nbr_max(key):
        """max over {self} ∪ strong neighbors.  Out-neighbors only: the
        strength criterion is symmetric and SA assumes a symmetric
        pattern (the 1-hop join below already relies on this), and the
        in-neighbor scatter-max it would otherwise need executes
        serialized on TPU — dropping it cut a PMIS round ~2x."""
        kj = jnp.where(strong, key[scols], jnp.int64(0))
        return jnp.maximum(key, jnp.max(kj, axis=0))

    def round_(st):
        ids, it = st
        live = ids == UNDEF
        key = jnp.where(live, w, jnp.int64(0))
        roots = live & (key == nbr_max(nbr_max(key)))
        ids = jnp.where(roots, rows, ids)

        # 1-hop join: undecided node takes the heaviest adjacent root
        root_w = jnp.where(roots, w, jnp.int64(0))
        adj = jnp.where(strong, root_w[scols], jnp.int64(0))   # (K, n)
        best = jnp.max(adj, axis=0)
        arg = jnp.argmax(adj, axis=0)
        join = live & ~roots & (best > 0)
        target = scols[arg, rows]
        ids = jnp.where(join, ids[target], ids)

        # 2-hop capture: undecided strong neighbours of just-joined
        # members follow them (the greedy pass's distance-2 reach,
        # plain_aggregates.hpp:171-184)
        mem_w = jnp.where(join, w, jnp.int64(0))
        adj2 = jnp.where(strong, mem_w[scols], jnp.int64(0))
        best2 = jnp.max(adj2, axis=0)
        arg2 = jnp.argmax(adj2, axis=0)
        join2 = (ids == UNDEF) & (best2 > 0)
        target2 = scols[arg2, rows]
        ids = jnp.where(join2, ids[target2], ids)
        return ids, it + 1

    def cond(st):
        ids, it = st
        return jnp.any(ids == UNDEF) & (it < max_rounds)

    ids, _ = jax.lax.while_loop(cond, round_, (ids0, jnp.int32(0)))
    # safety net: anything still undecided roots itself
    ids = jnp.where(ids == UNDEF, rows, ids)

    # renumber root-node indices to 0..count-1
    root_hit = (
        jnp.zeros(n, dtype=jnp.int32)
        .at[jnp.where(ids >= 0, ids, 0)]
        .max(jnp.where(ids >= 0, 1, 0))
    )
    remap = jnp.cumsum(root_hit) - 1
    count = jnp.sum(root_hit)
    ids = jnp.where(ids >= 0, remap[jnp.where(ids >= 0, ids, 0)], ids)
    return ids, count, strong


# ----------------------------------------------------------------------
# smoothed prolongation on ELL (jittable)
# ----------------------------------------------------------------------

def smoothed_prolongation_ell(data, cols, ids, strong, omega):
    """P = (I − ω D_F⁻¹ A_F) P_tent on the ELL layout (reference
    semantics, coarsening/smoothed_aggregation.hpp:139-232): A_F keeps
    strong off-diagonals, weak ones lump into the diagonal; P_tent is
    piecewise-constant over aggregates.

    Returns (P_data, P_cols) shaped (K+1, n): slot K carries the (1−ω)
    diagonal term routed to the row's own aggregate.  Entries routed to
    removed columns (ids < 0) and removed rows are zero.  Duplicate
    columns (several strong neighbours in one aggregate) are retained —
    downstream SpMV / RAP sum them."""
    K, n = data.shape
    rows = jnp.arange(n, dtype=jnp.int32)
    dia = _ell_diagonal(data, cols)
    off = (cols != rows[None, :]) & (data != 0)
    weak = off & ~strong
    dia_F = dia + jnp.sum(jnp.where(weak, data, 0.0), axis=0)
    inv_dF = jnp.where(
        dia_F != 0, 1.0 / jnp.where(dia_F == 0, 1.0, dia_F), 0.0
    )

    agg_j = ids[cols]                                    # (K, n)
    okj = strong & (agg_j >= 0) & (ids >= 0)[None, :]
    P_off = jnp.where(okj, -omega * inv_dF[None, :] * data, 0.0)
    Pc_off = jnp.where(okj, agg_j, 0).astype(jnp.int32)

    oki = ids >= 0
    P_dia = jnp.where(oki, 1.0 - omega, 0.0)[None, :]
    Pc_dia = jnp.where(oki, ids, 0).astype(jnp.int32)[None, :]

    return (
        jnp.concatenate([P_off, P_dia], axis=0),
        jnp.concatenate([Pc_off, Pc_dia], axis=0),
    )


# ----------------------------------------------------------------------
# sort-based sparse products (jittable)
# ----------------------------------------------------------------------

_HUGE = jnp.int32(0x7FFFFFFF)


def _shift_right(x, d):
    """x shifted right by d with zero fill (static slices only)."""
    pad = jnp.zeros((d,), x.dtype)
    return jnp.concatenate([pad, x[:-d]])


def _seg_incl_scan_sum(val, seg_id):
    """Inclusive segmented sum via unrolled Hillis–Steele shift passes —
    log2(n) elementwise sweeps, no gathers, no scan combinators (an
    associative_scan formulation OOMs the XLA compiler at these sizes).
    seg_id must be non-decreasing (e.g. cumsum of start flags)."""
    out = val
    n = val.shape[0]
    d = 1
    while d < n:
        same = seg_id == _shift_right(seg_id, d)
        out = out + jnp.where(same, _shift_right(out, d),
                              jnp.zeros_like(out))
        d *= 2
    return out


def _seg_total_at_first(val, seg_id, first):
    """Each segment's TOTAL placed at its first element (suffix-sum scan
    on the flipped array), zeros elsewhere."""
    rev = jnp.flip(val)
    rev_id = jnp.flip(seg_id)
    incl = _seg_incl_scan_sum(rev, rev_id)
    return jnp.where(first, jnp.flip(incl), jnp.zeros_like(val))


def _copy_forward_i32(v, start):
    """out[i] = v at the most recent position with start=True (v >= 0):
    a cummax over (segment counter << 32 | payload) — gather-free."""
    cnt = jnp.cumsum(start.astype(jnp.int32)).astype(jnp.int64)
    enc = jnp.where(
        start, (cnt << 32) | (v.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)),
        jnp.int64(0),
    )
    m = jax.lax.cummax(enc)
    return (m & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)


def _terms_to_ell(row, col, val, nrows, k_bound):
    """Compress flat product terms into planar ELL (k_bound, nrows) with
    NO gathers or scatters — XLA executes both essentially serialized on
    TPU (~0.14 Gelem/s), so everything here is multi-operand `lax.sort`,
    segmented scans and elementwise ops:

    1. append k_bound synthetic zero terms per row (hole fillers);
    2. co-sort (row, colkey, val) — dead terms get colkey=HUGE so they
       cluster at each row's tail;
    3. merge duplicate (row, col) runs via segmented total scans;
    4. assign every element a target slot: live entries get
       (rank-within-row, row); fillers take the remaining hole slots of
       their row, so slot keys are unique and cover every
       (rank < k_bound, row) pair exactly once;
    5. co-sort by (rank, row) and slice the first k_bound*nrows — the
       sorted order IS the flattened planar ELL.

    Entries beyond k_bound sort past the slice (the returned kmax lets
    the host detect overflow and retry with a larger bound).  Returns
    (data, cols, kmax, nnz)."""
    n_syn = k_bound * nrows
    syn_row = jnp.arange(n_syn, dtype=jnp.int32) % nrows
    row = jnp.concatenate([row.astype(jnp.int32), syn_row])
    colkey = jnp.concatenate([
        jnp.where(val == 0, _HUGE, col.astype(jnp.int32)),
        jnp.full((n_syn,), _HUGE, jnp.int32),
    ])
    val = jnp.concatenate([val, jnp.zeros((n_syn,), val.dtype)])

    row, colkey, val = jax.lax.sort((row, colkey, val), num_keys=2)

    new_row = jnp.concatenate([jnp.array([True]), row[1:] != row[:-1]])
    new_key = new_row | jnp.concatenate(
        [jnp.array([True]), colkey[1:] != colkey[:-1]]
    )
    key_id = jnp.cumsum(new_key.astype(jnp.int32))
    row_id = jnp.cumsum(new_row.astype(jnp.int32))
    tot = _seg_total_at_first(val, key_id, new_key)
    live = new_key & (colkey != _HUGE) & (tot != 0)

    live_i = live.astype(jnp.int32)
    rank_live = _seg_incl_scan_sum(live_i, row_id) - live_i
    nlive_first = _seg_total_at_first(live_i, row_id, new_row)
    nlive_row = _copy_forward_i32(nlive_first, new_row)
    fill_i = (~live).astype(jnp.int32)
    rank_fill = _seg_incl_scan_sum(fill_i, row_id) - fill_i
    rank = jnp.where(live, rank_live, nlive_row + rank_fill)

    kmax = jnp.max(jnp.where(live, rank + 1, 0))
    nnz = jnp.sum(live.astype(jnp.int64))

    out_val = jnp.where(live, tot, 0.0).astype(val.dtype)
    out_col = jnp.where(live, colkey, 0)
    rank, row, out_val, out_col = jax.lax.sort(
        (rank, row, out_val, out_col), num_keys=2
    )
    data = out_val[: k_bound * nrows].reshape(k_bound, nrows)
    cols = out_col[: k_bound * nrows].reshape(k_bound, nrows)
    return data, cols, kmax, nnz


@partial(jax.jit, static_argnames=("kap_bound",))
def spgemm_ap_device(A_data, A_cols, P_data, P_cols, kap_bound):
    """AP = A @ P for planar ELL factors (same fine row space)."""
    j = A_cols                                           # (KA, n)
    PD = P_data.T[j]                                     # (KA, n, KP)
    PC = P_cols.T[j]
    T = A_data[:, :, None] * PD                          # (KA, n, KP)
    n = A_data.shape[1]
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :, None], T.shape
    )
    return _terms_to_ell(
        rows.reshape(-1), PC.reshape(-1), T.reshape(-1), n, kap_bound
    )


@partial(jax.jit, static_argnames=("nc", "kc_bound"))
def spgemm_ptb_device(P_data, P_cols, B_data, B_cols, nc, kc_bound):
    """C = Pᵀ @ B where P and B share the fine row space (the Galerkin
    contraction): per fine row i, outer(P slots, B slots) terms keyed
    (P_cols[kr,i], B_cols[kb,i])."""
    W = P_data[:, None, :] * B_data[None, :, :]          # (KP, KB, n)
    a = jnp.broadcast_to(P_cols[:, None, :], W.shape)
    b = jnp.broadcast_to(B_cols[None, :, :], W.shape)
    return _terms_to_ell(
        a.reshape(-1), b.reshape(-1), W.reshape(-1), nc, kc_bound
    )


# ----------------------------------------------------------------------
# block-valued systems: scalar expansion, condensation, block-aligned
# aggregation (the device counterpart of the reference's block-value
# setup — aggregation over math::norm of the b×b blocks,
# coarsening/smoothed_aggregation.hpp + value_type/static_matrix.hpp —
# rebuilt on the same sort/scan machinery as the scalar path)
# ----------------------------------------------------------------------


@partial(jax.jit, static_argnames=("b",))
def expand_block_ell(data, cols, b):
    """Scalar planar-ELL view of a block planar-ELL operator.

    data (K, b, b, nb) / cols (K, nb) → scalar (K·b, nb·b) planes where
    scalar row I·b+r holds entry (k·b+c) = (A_{I,cols[k,I]})[r,c] at
    scalar column cols[k,I]·b+c.  Pure transpose/reshape/broadcast — no
    gathers."""
    K, _, _, nb = data.shape
    d = jnp.transpose(data, (0, 2, 3, 1)).reshape(K * b, nb * b)
    c = (
        cols[:, None, :, None] * b
        + jnp.arange(b, dtype=cols.dtype)[None, :, None, None]
    )
    c = jnp.broadcast_to(c, (K, b, nb, b)).reshape(K * b, nb * b)
    return d, c


@partial(jax.jit, static_argnames=("b", "k_bound"))
def condense_scalar_ell(data, cols, b, k_bound):
    """Block-connectivity magnitude graph from scalar planar ELL:
    C[I, J] = ||A_{IJ}||_F over the b×b block (I = i//b, J = j//b).

    One sort-compress over the (block-row, block-col, value²) terms —
    the same `_terms_to_ell` machinery as the RAP; returns
    (C_data, C_cols, kmax, nnz) with kmax for overflow retry."""
    K, n = data.shape
    nb = n // b
    rows = jnp.broadcast_to(
        (jnp.arange(n, dtype=jnp.int32) // b)[None, :], (K, n)
    )
    Cd, Cc, kmax, nnz = _terms_to_ell(
        rows.reshape(-1),
        (cols // b).reshape(-1),
        (data * data).reshape(-1),
        nb,
        k_bound,
    )
    return jnp.sqrt(Cd), Cc, kmax, nnz


@partial(jax.jit, static_argnames=("b",))
def expand_block_ids(ids_b, b):
    """Scalar aggregate ids from block aggregate ids: scalar unknown
    I·b+r joins coarse scalar column ids_b[I]·b+r (component-preserving
    block-identity tentative); negative (removed) ids pass through."""
    r = jnp.arange(b, dtype=ids_b.dtype)
    e = ids_b[:, None] * b + r[None, :]
    e = jnp.where(ids_b[:, None] >= 0, e, ids_b[:, None])
    return e.reshape(-1)


@partial(jax.jit, static_argnames=("b",))
def block_strong_scalar(data, cols, C_cols, strong_b, b):
    """Scalar-entry strength mask from the block strength pattern: a
    scalar off-diagonal entry is kept in the filtered matrix iff its
    enclosing block (I, J) is a strong block connection or lies on the
    block diagonal (J == I — intra-block couplings are never lumped).
    Zero/padding entries are never strong.

    The condensed pattern is expanded to scalar rows by a contiguous
    broadcast (no gather); each of the Ks scalar slots then scans the
    Kc condensed slots for its block column (`lax.map` over slots keeps
    the working set at (Kc, n))."""
    Ks, n = cols.shape
    rows = jnp.arange(n, dtype=jnp.int32)
    I = rows // b
    Cc_exp = jnp.repeat(C_cols, b, axis=1)               # (Kc, n)
    Sb_exp = jnp.repeat(strong_b, b, axis=1)
    Jb = cols // b                                       # (Ks, n)

    def one(jrow):
        return jnp.any((Cc_exp == jrow[None, :]) & Sb_exp, axis=0)

    strong = jax.lax.map(one, Jb)
    intra = Jb == I[None, :]
    off = cols != rows[None, :]
    return (strong | intra) & off & (data != 0)
