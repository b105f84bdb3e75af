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
