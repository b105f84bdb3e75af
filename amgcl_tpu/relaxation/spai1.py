"""SPAI(1) smoother — sparse approximate inverse on the pattern of A.

Reference: amgcl/relaxation/spai1.hpp:53.  Each row m_i of M minimizes
||e_i - m_i A||_2 over the sparsity pattern of row i of A.  Setup solves
one small dense least-squares problem per row; rows are padded to the max
pattern size and solved as a single batched numpy lstsq (expensive setup,
like the reference notes).  Application is x += M (rhs - A x) with M in
the same ELL device format as A.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.formats import SparseMatrix
from ..ops.spmv import spmv


@partial(
    jax.tree_util.register_dataclass, data_fields=["M"], meta_fields=[]
)
@dataclasses.dataclass(frozen=True)
class SPAI1State:
    M: SparseMatrix


def _csr_value_lookup(keys_sorted, data, q):
    """Vectorized lookup of CSR entries by flat key q = row*n + col; the
    canonical CSR order makes the key array globally sorted, so one
    binary search + zero fill answers every query."""
    pos = np.searchsorted(keys_sorted, q.ravel())
    np.minimum(pos, len(keys_sorted) - 1, out=pos)
    kk = keys_sorted[pos]
    out = data[pos]
    out[kk != q.ravel()] = 0.0
    return out.reshape(q.shape)


@dataclasses.dataclass
class SPAI1:
    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> SPAI1State:
        """Fully vectorized setup (the reference notes SPAI(1) setup is
        expensive and parallelizes it, spai1.hpp:53; here every per-row
        least-squares is batched):

        Gram entries G_i[a,b] = <A_{J_i[a]}, A_{J_i[b]}> are exactly the
        (J_i[a], J_i[b]) entries of B = A Aᵀ — one scipy SpGEMM plus a
        sorted-key binary-search lookup replaces all per-row slicing; the
        padded per-row systems solve as a single batched np.linalg.solve.
        """
        A = sp.csr_matrix(A_host)
        A.sort_indices()
        n = A.shape[0]
        counts = np.diff(A.indptr)
        K = int(counts.max()) if n else 1

        # padded per-row pattern J (n, K); pad slots repeat the row itself
        # (they are masked out of the solve via identity padding below)
        J = np.zeros((n, K), dtype=np.int64)
        rows = np.repeat(np.arange(n), counts)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        J[:] = np.arange(n)[:, None]
        J[rows, offs] = A.indices

        B = sp.csr_matrix(A @ A.T)
        B.sort_indices()
        Brows = np.repeat(np.arange(n), np.diff(B.indptr)).astype(np.int64)
        Bkeys = Brows * n + B.indices.astype(np.int64)
        Akeys = rows * np.int64(n) + A.indices.astype(np.int64)

        # Batched per-row least squares, chunked over rows so the
        # (chunk, K, K) Gram tensor stays bounded (a dense-ish coarse
        # level with K ~ 1000 would otherwise allocate n*K*K at once —
        # observed as a 212 GiB MemoryError on a nullspace-smoothed RAP).
        chunk = max(1, min(n, int(256e6 // max(K * K * 8, 1))))
        m = np.empty((n, K), dtype=B.data.dtype)
        slot = np.arange(K)
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            Jc = J[i0:i1]
            # G = B[J[:, :, None], J[:, None, :]] via flat key lookup
            G = _csr_value_lookup(
                Bkeys, B.data, Jc[:, :, None] * np.int64(n) + Jc[:, None, :]
            )
            # rhs b[a] = A[J[a], i]
            b = _csr_value_lookup(
                Akeys, A.data,
                Jc * np.int64(n) + np.arange(i0, i1)[:, None],
            )
            # identity-pad the unused slots so one batched solve covers
            # all row sizes: pad rows/cols of G become e_a with b=0
            pad = slot[None, :] >= counts[i0:i1, None]
            padm = pad[:, :, None] | pad[:, None, :]
            G[padm] = 0.0
            da = np.nonzero(pad)
            G[da[0], da[1], da[1]] = 1.0
            b[pad] = 0.0
            try:
                m[i0:i1] = np.linalg.solve(G, b[..., None])[..., 0]
            except np.linalg.LinAlgError:
                # singular rows: ridge-regularize only those
                sing = np.abs(np.linalg.det(G)) < 1e-300
                G[sing] += 1e-12 * np.eye(K)
                m[i0:i1] = np.linalg.solve(G, b[..., None])[..., 0]

        mvals = m[rows, offs]
        from ..ops.formats import from_scipy_auto
        M = sp.csr_matrix((mvals, A.indices, A.indptr), shape=A.shape)
        return SPAI1State(M=from_scipy_auto(M, dtype=A_dev.dtype))


def spai1_apply(state: SPAI1State, A: SparseMatrix, rhs, x=None):
    if x is None:          # zero initial guess: skip the A @ 0 SpMV
        return spmv(state.M, rhs)
    return x + spmv(state.M, rhs - spmv(A, x))
