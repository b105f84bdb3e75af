"""Graph partitioners for the distributed layer.

The reference repartitions coarse levels with ParMETIS / PT-SCOTCH or a
simple rank-merging scheme (amgcl/mpi/partition/).  Here partitioning is
a host-side *reordering*: the distributed layer always shards equal
contiguous row slabs, so a partitioner's job is to produce a permutation
that (a) balances the parts and (b) minimizes the halo (edge cut between
consecutive slabs).

* `partition_bfs` — greedy graph-growing (BFS) partition: grows each part
  from the lowest-degree unvisited seed until it holds n/S rows, then
  renumbers part by part.  The role of parmetis/ptscotch without the
  external dependency.
* `merge_small` — the analogue of partition::merge
  (amgcl/mpi/partition/merge.hpp:47-143): decides when a coarse level has
  too few rows per shard and should collapse onto fewer (replicated)
  shards; the coupled hierarchies use the same rule via their `min_loc`
  threshold, so this helper mostly serves the public API.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def partition_bfs(A: sp.csr_matrix, S: int) -> np.ndarray:
    """Return a permutation ``perm`` (new order of the original rows) such
    that contiguous slabs of the permuted matrix are balanced, connected
    (when the graph is), and have small boundary."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    target = (n + S - 1) // S
    # symmetrize the pattern for traversal
    G = (A + A.T).tocsr()
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    deg = np.diff(G.indptr)

    unvisited_order = np.argsort(deg, kind="stable")
    uv_ptr = 0
    from collections import deque

    q = deque()
    while pos < n:
        # When a part fills up, restart the frontier from a fresh
        # lowest-degree unplaced seed so each slab grows compactly from
        # its own region (the graph-growing heuristic of the
        # parmetis/ptscotch role) instead of inheriting the previous
        # part's scattered frontier.  Nodes are marked placed at *pop*
        # time, so dropping a frontier loses nothing (the queue may hold
        # duplicates, skipped when already placed).
        if pos % target == 0:
            q.clear()
        i = -1
        while q:
            cand = q.popleft()
            if not visited[cand]:
                i = cand
                break
        if i < 0:
            while uv_ptr < n and visited[unvisited_order[uv_ptr]]:
                uv_ptr += 1
            i = int(unvisited_order[uv_ptr])
        visited[i] = True
        order[pos] = i
        pos += 1
        for j in G.indices[G.indptr[i] : G.indptr[i + 1]]:
            if not visited[j]:
                q.append(j)
    return order


def refine_kl(A: sp.csr_matrix, perm: np.ndarray, S: int,
              passes: int = 4, max_swaps: int = 2000) -> np.ndarray:
    """Kernighan–Lin boundary refinement of a slab partition.

    The distributed layer shards *equal contiguous row slabs*, so
    refinement must preserve exact part sizes: improvement moves are
    pairwise SWAPS between adjacent slabs (the multilevel-refinement
    role of parmetis/ptscotch, amgcl/mpi/partition/parmetis.hpp, without
    the external dependency).  Greedy positive-gain swaps of boundary
    nodes, repeated for ``passes`` sweeps or until no improvement.

    Returns the refined permutation (same slab sizes as ``perm``)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    if S <= 1 or n < 2 * S:
        return perm
    G = (A + A.T).tocsr()
    G.sort_indices()
    indptr, indices = G.indptr, G.indices

    target = (n + S - 1) // S
    part = np.empty(n, dtype=np.int64)
    # perm[k] = original row at new position k -> slab k // target
    part[perm] = np.arange(n) // target

    def ext_deg(i, a, b):
        """(#edges of i into part a, #edges into part b)."""
        nb = indices[indptr[i] : indptr[i + 1]]
        pa = part[nb]
        return int((pa == a).sum()), int((pa == b).sum())

    for _ in range(passes):
        improved = False
        for a in range(S - 1):
            b = a + 1
            # boundary candidates of this pair
            cand_a = [i for i in np.nonzero(part == a)[0]
                      if (part[indices[indptr[i]:indptr[i + 1]]] == b).any()]
            cand_b = [i for i in np.nonzero(part == b)[0]
                      if (part[indices[indptr[i]:indptr[i + 1]]] == a).any()]
            if not cand_a or not cand_b:
                continue

            def gain(i, frm, to):
                da, db = ext_deg(i, frm, to)
                return db - da           # cut reduction of moving i frm->to

            ga = sorted(((gain(i, a, b), i) for i in cand_a), reverse=True)
            gb = sorted(((gain(j, b, a), j) for j in cand_b), reverse=True)
            swaps = 0
            ia = ib = 0
            while ia < len(ga) and ib < len(gb) and swaps < max_swaps:
                gi, i = ga[ia]
                gj, j = gb[ib]
                # stale gains (a previous swap may have changed them)
                gi2 = gain(i, a, b)
                gj2 = gain(j, b, a)
                if gi2 != gi:
                    ga[ia] = (gi2, i)
                    ga[ia:] = sorted(ga[ia:], reverse=True)
                    continue
                if gj2 != gj:
                    gb[ib] = (gj2, j)
                    gb[ib:] = sorted(gb[ib:], reverse=True)
                    continue
                w = 0
                nb = indices[indptr[i] : indptr[i + 1]]
                if j in nb:
                    w = int((nb == j).sum())
                if gi + gj - 2 * w <= 0:
                    break
                part[i], part[j] = b, a
                swaps += 1
                ia += 1
                ib += 1
                improved = True
        if not improved:
            break

    # rebuild permutation: stable sort by part keeps the BFS ordering
    # inside each slab (locality within the slab is what the windowed
    # kernels want)
    pos_in_perm = np.empty(n, dtype=np.int64)
    pos_in_perm[perm] = np.arange(n)
    order = np.lexsort((pos_in_perm, part))
    return order.astype(np.int64)


def edge_cut(A: sp.csr_matrix, perm: np.ndarray, S: int) -> int:
    """Number of (directed) pattern entries crossing slab boundaries under
    the slab partition induced by ``perm`` — the halo-size metric."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    target = (n + S - 1) // S
    part = np.empty(n, dtype=np.int64)
    part[perm] = np.arange(n) // target
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    return int((part[rows] != part[A.indices]).sum())


def apply_partition(A: sp.csr_matrix, perm: np.ndarray):
    """Permute matrix (and return the inverse mapping for vectors):
    B = A[perm][:, perm];  x_orig = x_new[inv]."""
    A = sp.csr_matrix(A)
    P = sp.csr_matrix(
        (np.ones(len(perm)), (np.arange(len(perm)), perm)), shape=A.shape
    )
    B = (P @ A @ P.T).tocsr()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return B, inv


def merge_small(n_rows: int, S: int, min_per_shard: int = 256) -> int:
    """How many shards should stay active for a level of n_rows rows —
    the decision rule of partition::merge (merge.hpp:47-143).  Returns a
    power-of-two-ish divisor of S (1 means replicate everywhere)."""
    active = S
    while active > 1 and n_rows // active < min_per_shard:
        active //= 2
    return max(active, 1)
