"""Aggregation (setup phase, host-side).

Re-implementation of the reference's aggregation semantics
(amgcl/coarsening/plain_aggregates.hpp:63-208 and
amgcl/coarsening/pointwise_aggregates.hpp:51) in numpy over scipy CSR:

* strength of connection: i,j strongly coupled iff
  ``a_ij^2 > eps^2 * a_ii * a_jj`` (symmetric, diagonal excluded);
* lonely nodes (no strong couplings) stay on the fine level (id = REMOVED);
* greedy single-pass aggregation with neighbour-of-neighbour capture;
* vanished aggregates renumbered away;
* block systems: compress to a pointwise (block-norm) matrix, aggregate
  that, then expand ids so each aggregate contributes `block` coarse dofs.

The greedy sweep is sequential by construction; a C++ kernel (see
amgcl_tpu/native) is used when available, with a pure-Python fallback.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

UNDEFINED = -1
REMOVED = -2


class EmptyLevelError(RuntimeError):
    """No aggregates could be formed (diagonal / fully-decoupled level) —
    the analogue of the reference's error::empty_level
    (amgcl/util.hpp:207)."""


@dataclasses.dataclass
class Aggregates:
    count: int                    # number of coarse dofs
    id: np.ndarray                # (n,) aggregate id per fine dof, or <0
    strong: np.ndarray            # (nnz,) bool per entry of A (CSR order)


def strong_connections(A: sp.csr_matrix, eps_strong: float) -> np.ndarray:
    """Per-nonzero strength mask, reference semantics
    (amgcl/coarsening/plain_aggregates.hpp:125-139: signed diagonal product)."""
    n = A.shape[0]
    dia = A.diagonal()
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    eps2 = eps_strong * eps_strong
    v = A.data
    return (A.indices != rows) & (eps2 * dia[rows] * dia[A.indices] < v * v)


def _greedy_sweep_py(indptr, indices, strong, ids):
    """The sequential greedy pass (pure-Python fallback)."""
    n = len(indptr) - 1
    count = 0
    for i in range(n):
        if ids[i] != UNDEFINED:
            continue
        cur = count
        count += 1
        ids[i] = cur
        beg, end = indptr[i], indptr[i + 1]
        neib = []
        for j in range(beg, end):
            c = indices[j]
            if strong[j] and ids[c] != REMOVED:
                ids[c] = cur
                neib.append(c)
        for c in neib:
            for j in range(indptr[c], indptr[c + 1]):
                cc = indices[j]
                if strong[j] and ids[cc] == UNDEFINED:
                    ids[cc] = cur
    return count


def _greedy_sweep(indptr, indices, strong, ids):
    try:
        from ..native import lib as _native
    except Exception:
        _native = None
    if _native is not None:
        return _native.greedy_aggregate(indptr, indices, strong, ids)
    return _greedy_sweep_py(indptr, indices, strong, ids)


def plain_aggregates(A: sp.csr_matrix, eps_strong: float = 0.08) -> Aggregates:
    n = A.shape[0]
    strong = strong_connections(A, eps_strong)

    # Lonely nodes are removed (stay at the fine level).  Per-row any()
    # via prefix sums — reduceat would crash on empty trailing rows
    # (indptr entries == nnz are out of range) and silently misreads
    # empty middle rows.
    if A.nnz:
        cs = np.concatenate([[0], np.cumsum(strong, dtype=np.int64)])
        row_has_strong = (cs[A.indptr[1:]] - cs[A.indptr[:-1]]) > 0
    else:
        row_has_strong = np.zeros(n, dtype=bool)
    ids = np.where(row_has_strong, UNDEFINED, REMOVED).astype(np.int64)

    count = _greedy_sweep(A.indptr, A.indices, strong, ids)
    if count == 0:
        raise EmptyLevelError("empty level: no aggregates could be formed")

    # Renumber: some aggregates may have vanished during capture.
    used = np.zeros(count, dtype=np.int64)
    valid = ids >= 0
    used[ids[valid]] = 1
    remap = np.cumsum(used) - 1
    ids[valid] = remap[ids[valid]]
    count = int(used.sum())
    return Aggregates(count=count, id=ids, strong=strong)


def pmis_aggregates(A: sp.csr_matrix, eps_strong: float = 0.08,
                    seed: int = 42) -> Aggregates:
    """Parallel maximal-independent-set (distance-2) aggregation — the
    algorithm family of the reference's distributed coarsening
    (amgcl/mpi/coarsening/pmis.hpp:50-1131), here as a vectorized
    data-parallel sweep with no sequential dependence:

    * every point draws a deterministic random weight;
    * rounds: an undecided point whose weight is the maximum among all
      undecided points within distance 2 of the strength graph becomes an
      aggregate root; undecided strong neighbours join the heaviest
      adjacent root, then neighbours-of-members are captured (the same
      distance-2 reach as the greedy pass);
    * repeats until everything is decided — O(log n) rounds, each a few
      segment max/argmax passes, which is exactly the shape that ports to
      a jittable on-device sweep.

    Produces the same Aggregates contract as `plain_aggregates` (ids,
    count, strength mask), so any aggregation-based coarsening can use it
    via ``aggregates='pmis'``.
    """
    n = A.shape[0]
    strong = strong_connections(A, eps_strong)
    rows_all = np.repeat(np.arange(n), np.diff(A.indptr))
    er = rows_all[strong]
    ec = A.indices[strong]

    row_has_strong = np.zeros(n, dtype=bool)
    row_has_strong[er] = True
    ids = np.where(row_has_strong, UNDEFINED, REMOVED).astype(np.int64)

    # Deterministic unique weights: a fixed pseudo-random permutation.
    rng = np.random.default_rng(seed)
    w = rng.permutation(n).astype(np.int64) + 1   # > 0; unique
    NEG = np.int64(0)

    count = 0
    # Each round decides at least the global undecided maximum (so n
    # rounds is a hard upper bound); in practice a constant fraction
    # falls every round and termination takes O(log n).
    for _ in range(max(200, n)):
        live = ids == UNDEFINED
        if not live.any():
            break
        key = np.where(live, w, NEG)
        # two max-propagations over the strength graph = distance-2 max
        m1 = key.copy()
        np.maximum.at(m1, er, key[ec])
        m2 = m1.copy()
        np.maximum.at(m2, er, m1[ec])
        roots = live & (key == m2) & (key > 0)
        ridx = np.flatnonzero(roots)
        if len(ridx) == 0:
            # only possible if live nodes all lost ties to dead maxima —
            # cannot happen with unique weights, but stay safe
            ridx = np.flatnonzero(live)[:1]
            roots = np.zeros(n, dtype=bool)
            roots[ridx] = True
        new_ids = count + np.arange(len(ridx), dtype=np.int64)
        ids[ridx] = new_ids
        count += len(ridx)

        # 1-hop capture: undecided nodes join the heaviest adjacent root.
        root_w = np.where(roots, w, NEG)
        best = np.zeros(n, dtype=np.int64)
        np.maximum.at(best, er, root_w[ec])
        join = live & ~roots & (best > 0)
        if join.any():
            # find the edge that achieves the max (weights unique)
            hit = join[er] & (root_w[ec] == best[er])
            ids[er[hit]] = ids[ec[hit]]

            # 2-hop capture: undecided nodes adjacent to a just-joined
            # member are pulled into that member's aggregate (greedy's
            # neighbour-of-neighbour reach, plain_aggregates.hpp:171-184).
            member = np.zeros(n, dtype=bool)
            member[er[hit]] = True
            mem_w = np.where(member, w, NEG)
            best2 = np.zeros(n, dtype=np.int64)
            live2 = ids == UNDEFINED
            np.maximum.at(best2, er, mem_w[ec])
            hit2 = live2[er] & (mem_w[ec] == best2[er]) & (mem_w[ec] > 0)
            ids[er[hit2]] = ids[ec[hit2]]
    else:
        raise RuntimeError("pmis aggregation did not converge")

    if count == 0:
        raise EmptyLevelError("empty level: no aggregates could be formed")

    # Renumber aggregates by their smallest fine index so coarse numbering
    # stays roughly monotone with fine rows (keeps the distributed halo
    # windows narrow).
    first = np.full(count, np.iinfo(np.int64).max)
    valid = ids >= 0
    np.minimum.at(first, ids[valid], np.flatnonzero(valid))
    order = np.argsort(first, kind="stable")
    remap = np.empty(count, dtype=np.int64)
    remap[order] = np.arange(count)
    ids[valid] = remap[ids[valid]]
    return Aggregates(count=count, id=ids, strong=strong)


def pointwise_matrix(A: sp.csr_matrix, block: int) -> sp.csr_matrix:
    """Compress a scalar matrix to its pointwise (per-block) norm matrix
    (reference: amgcl/backend/builtin.hpp:505 — value is the sum of entry
    norms over each block)."""
    n, m = A.shape
    nb, mb = n // block, m // block
    Aa = sp.csr_matrix(
        (np.abs(A.data), A.indices, A.indptr), shape=A.shape
    )
    # Block-sum both dimensions with boolean aggregation operators.
    Rb = sp.csr_matrix(
        (np.ones(n), (np.arange(n) // block, np.arange(n))), shape=(nb, n)
    )
    Cb = sp.csr_matrix(
        (np.ones(m), (np.arange(m), np.arange(m) // block)), shape=(m, mb)
    )
    Ap = (Rb @ Aa @ Cb).tocsr()
    Ap.sum_duplicates()
    return Ap


AGGREGATORS = {"greedy": plain_aggregates, "pmis": pmis_aggregates}


def pointwise_aggregates(
    A: sp.csr_matrix, eps_strong: float = 0.08, block: int = 1,
    method: str = "greedy",
) -> Aggregates:
    """Block-aware aggregation (reference:
    amgcl/coarsening/pointwise_aggregates.hpp:51): aggregate the pointwise
    matrix, then expand so each aggregate yields `block` coarse dofs laid
    out contiguously.  ``method`` picks the scalar aggregator: the greedy
    sequential pass or the data-parallel PMIS sweep."""
    aggregate = AGGREGATORS[method]
    if block == 1:
        return aggregate(A, eps_strong)
    Ap = pointwise_matrix(A, block)
    pw = aggregate(Ap, eps_strong)
    n = A.shape[0]
    ids = np.empty(n, dtype=np.int64)
    k = np.arange(n) % block
    pw_id = pw.id[np.arange(n) // block]
    ids = np.where(pw_id >= 0, block * pw_id + k, pw_id)
    # Expand the strength mask to the scalar sparsity: an entry is strong iff
    # its containing block is strong or diagonal, excluding the scalar
    # diagonal itself (pointwise_aggregates.hpp:90-117).
    Sb = sp.csr_matrix(
        (pw.strong | (Ap.indices == np.repeat(np.arange(Ap.shape[0]),
                                              np.diff(Ap.indptr))),
         Ap.indices, Ap.indptr),
        shape=Ap.shape,
    )
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    blk_strong = np.asarray(
        Sb[rows // block, A.indices // block]
    ).ravel().astype(bool)
    strong = blk_strong & (A.indices != rows)
    return Aggregates(count=pw.count * block, id=ids, strong=strong)
