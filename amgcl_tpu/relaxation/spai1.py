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


@dataclasses.dataclass
class SPAI1:
    def setup(self, A_host: sp.csr_matrix, A_dev: SparseMatrix) -> SPAI1State:
        A = sp.csr_matrix(A_host)
        A.sort_indices()
        n = A.shape[0]
        AT = A.T.tocsr()  # columns of A by row

        counts = np.diff(A.indptr)
        K = int(counts.max())
        mvals = np.zeros(A.nnz)

        # Batch rows by pattern size to keep the padded LS well-conditioned.
        for sz in np.unique(counts):
            rows = np.nonzero(counts == sz)[0]
            J = np.zeros((len(rows), sz), dtype=np.int64)
            for t, i in enumerate(rows):
                J[t] = A.indices[A.indptr[i] : A.indptr[i] + sz]
            # Union pattern per row: K_i = pattern of A[J_i, :]. Build dense
            # normal equations instead: m_i = e_i A_Jᵀ (A_J A_Jᵀ)^{-1} with
            # A_J = A[J_i, :]; Gram entries are sparse dot products.
            G = np.empty((len(rows), sz, sz))
            b = np.empty((len(rows), sz))
            for t, i in enumerate(rows):
                sub = A[J[t]]  # (sz, n) sparse
                G[t] = (sub @ sub.T).todense()
                b[t] = np.asarray(sub[:, i].todense()).ravel()
            # Solve G m = b (normal equations of min ||e_i - m A_J||).
            try:
                m = np.linalg.solve(G, b[..., None])[..., 0]
            except np.linalg.LinAlgError:
                m = np.linalg.lstsq(
                    G.reshape(-1, sz, sz).transpose(0, 1, 2).reshape(-1, sz),
                    b.reshape(-1, sz),
                    rcond=None,
                )[0]
            for t, i in enumerate(rows):
                mvals[A.indptr[i] : A.indptr[i] + sz] = m[t]

        from ..ops.formats import from_scipy_auto
        M = sp.csr_matrix((mvals, A.indices, A.indptr), shape=A.shape)
        return SPAI1State(M=from_scipy_auto(M, dtype=A_dev.dtype))


def spai1_apply(state: SPAI1State, A: SparseMatrix, rhs, x):
    return x + spmv(state.M, rhs - spmv(A, x))
