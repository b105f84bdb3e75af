"""Classic Ruge–Stüben coarsening.

Re-implementation of the reference semantics
(amgcl/coarsening/ruge_stuben.hpp:54-230): strong *negative* couplings
(-a_ij >= eps_str * max(-a_ik)), standard C/F splitting driven by
descending lambda counts (cfsplit, :322-436), and direct interpolation
with optional truncation (eps_trunc with weight rescaling, :144-245).

The C/F split is a sequential priority sweep; it runs on the host (numpy +
a Python/bucket loop), like every setup-phase pass.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .smoothed_aggregation import galerkin


def connect(A: sp.csr_matrix, eps_strong: float):
    """Per-nonzero strength mask: a_ij < eps_strong * min_k(a_ik), with
    rows whose off-diagonal minimum is ~0 pre-marked F."""
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag = A.indices != rows
    vals = np.where(offdiag, A.data, 0.0)
    a_min = np.minimum.reduceat(
        np.where(offdiag, A.data, np.inf), A.indptr[:-1]
    )
    a_min = np.where(np.diff(A.indptr) > 0, a_min, 0.0)
    a_min = np.minimum(a_min, 0.0)

    no_neg = np.abs(a_min) < np.finfo(np.float64).eps
    thresh = a_min * eps_strong
    S = offdiag & (A.data < thresh[rows])
    return S, no_neg


def cfsplit(A: sp.csr_matrix, S: np.ndarray, forced_F: np.ndarray):
    """Standard RS first-pass C/F splitting (reference cfsplit,
    ruge_stuben.hpp:322-436). Returns cf array: +1 = C, 0 = F."""
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))

    # S^T adjacency: who strongly depends on i.
    St = sp.csr_matrix(
        (np.ones(int(S.sum())), (A.indices[S], rows[S])), shape=(n, n)
    )
    St.sum_duplicates()

    U, C, F = 0, 1, 2
    cf = np.full(n, U, dtype=np.int8)
    cf[forced_F] = F

    # lambda_i = #{j in S^T(i): U} + 2*#{j in S^T(i): F}
    lam = np.zeros(n, dtype=np.int64)
    st_rows = np.repeat(np.arange(n), np.diff(St.indptr))
    contrib = np.where(cf[St.indices] == U, 1, 2)
    np.add.at(lam, st_rows, contrib)

    import heapq

    heap = [(-lam[i], i) for i in range(n)]
    heapq.heapify(heap)
    indptr, indices = A.indptr, A.indices
    st_indptr, st_indices = St.indptr, St.indices

    while heap:
        neg, i = heapq.heappop(heap)
        if cf[i] != U or -neg != lam[i]:
            continue  # stale entry
        if lam[i] == 0:
            cf[cf == U] = C
            break
        cf[i] = C
        # Neighbours that strongly depend on i become F.
        for c in st_indices[st_indptr[i] : st_indptr[i + 1]]:
            if cf[c] != U:
                continue
            cf[c] = F
            # F's strong influencers get lambda boosted.
            for j in range(indptr[c], indptr[c + 1]):
                if not S[j]:
                    continue
                ac = indices[j]
                if cf[ac] == U:
                    lam[ac] += 1
                    heapq.heappush(heap, (-lam[ac], ac))
        # i's strong influencers get lambda decreased.
        for j in range(indptr[i], indptr[i + 1]):
            if not S[j]:
                continue
            c = indices[j]
            if cf[c] == U and lam[c] > 0:
                lam[c] -= 1
                heapq.heappush(heap, (-lam[c], c))

    return cf == C


@dataclasses.dataclass
class RugeStuben:
    eps_strong: float = 0.25
    do_trunc: bool = True
    eps_trunc: float = 0.2

    def transfer_operators(self, A: sp.csr_matrix):
        A = sp.csr_matrix(A)
        A.sort_indices()
        n = A.shape[0]
        S, forced_F = connect(A, self.eps_strong)
        is_C = cfsplit(A, S, forced_F)
        nc = int(is_C.sum())
        if nc == 0:
            raise RuntimeError("empty level in Ruge-Stuben coarsening")
        cidx = np.cumsum(is_C) - 1

        rows = np.repeat(np.arange(n), np.diff(A.indptr))
        dia = A.diagonal().copy()
        offdiag = A.indices != rows
        v = A.data

        strong_C = S & is_C[A.indices]
        neg = offdiag & (v < 0)
        pos = offdiag & (v > 0)

        def rowsum(mask):
            out = np.zeros(n)
            np.add.at(out, rows[mask], v[mask])
            return out

        a_num, a_den = rowsum(neg), rowsum(neg & strong_C)
        b_num, b_den = rowsum(pos), rowsum(pos & strong_C)

        if self.do_trunc:
            # Per-row min/max over strong-C entries, then keep entries
            # outside [eps_trunc*min, eps_trunc*max]; rescale kept weights.
            amin = np.zeros(n)
            amax = np.zeros(n)
            np.minimum.at(amin, rows[strong_C], v[strong_C])
            np.maximum.at(amax, rows[strong_C], v[strong_C])
            amin *= self.eps_trunc
            amax *= self.eps_trunc
            keep = strong_C & ((v < amin[rows]) | (v > amax[rows]))
            d_neg = rowsum(neg & strong_C & keep)
            d_pos = rowsum(pos & strong_C & keep)
            eps = np.finfo(np.float64).eps
            cf_neg = np.where(np.abs(d_neg) > eps, a_den / np.where(d_neg == 0, 1, d_neg), 1.0)
            cf_pos = np.where(np.abs(d_pos) > eps, b_den / np.where(d_pos == 0, 1, d_pos), 1.0)
        else:
            keep = strong_C
            cf_neg = np.ones(n)
            cf_pos = np.ones(n)

        eps = np.finfo(np.float64).eps
        # No strong positive C-neighbours: fold positive sum into diagonal.
        dia = dia + np.where((b_num > 0) & (np.abs(b_den) < eps), b_num, 0.0)
        alpha = np.where(
            np.abs(a_den) > eps,
            -cf_neg * a_num / (dia * np.where(a_den == 0, 1, a_den)),
            0.0,
        )
        beta = np.where(
            np.abs(b_den) > eps,
            -cf_pos * b_num / (dia * np.where(b_den == 0, 1, b_den)),
            0.0,
        )

        # Assemble P: identity rows for C points, weighted rows for F.
        keep_F = keep & ~is_C[rows]
        pr = rows[keep_F]
        pc = cidx[A.indices[keep_F]]
        pv = np.where(v[keep_F] < 0, alpha[pr], beta[pr]) * v[keep_F]

        c_rows = np.nonzero(is_C)[0]
        P = sp.coo_matrix(
            (
                np.concatenate([pv, np.ones(nc)]),
                (np.concatenate([pr, c_rows]), np.concatenate([pc, cidx[c_rows]])),
            ),
            shape=(n, nc),
        ).tocsr()
        P.sum_duplicates()
        return P, P.T.tocsr()

    def coarse_operator(self, A, P, R):
        return galerkin(A, P, R)
