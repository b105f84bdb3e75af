"""Tentative prolongation.

Reference: amgcl/coarsening/tentative_prolongation.hpp:63-228.  Without a
near-nullspace, the tentative operator is piecewise constant (one unit entry
per aggregated fine dof).  With nullspace vectors B (n × ncols), each
aggregate's rows of B are QR-factorized: P gets the Q factor, and the R
factors become the coarse-level nullspace — done here as one *batched*
numpy QR over zero-padded per-aggregate blocks (zero rows do not perturb
the factorization: [B;0] = [Q;0]·R).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .aggregates import Aggregates


def tentative_prolongation(
    n: int,
    aggr: Aggregates,
    nullspace: np.ndarray | None = None,
    block: int = 1,
):
    """Returns (P, B_coarse). P is scipy CSR (n × n_coarse); B_coarse is the
    coarse near-nullspace (or None)."""
    ids = aggr.id
    if nullspace is None:
        valid = ids >= 0
        rows = np.nonzero(valid)[0]
        P = sp.csr_matrix(
            (np.ones(len(rows)), (rows, ids[rows])), shape=(n, aggr.count)
        )
        return P, None

    B = np.asarray(nullspace, dtype=np.float64)
    ncols = B.shape[1]
    # Aggregates are tracked per *block row*; each aggregate spans complete
    # blocks (pointwise aggregation guarantees this).
    nba = aggr.count // block
    block_agg = np.where(ids >= 0, ids // block, -1)

    valid = block_agg >= 0
    order = np.argsort(block_agg[valid], kind="stable")
    rows = np.nonzero(valid)[0][order]          # fine dofs sorted by aggregate
    agg_of_row = block_agg[rows]
    counts = np.bincount(agg_of_row, minlength=nba)
    max_sz = int(counts.max()) if len(counts) else 0

    # Zero-padded (nba, max_sz, ncols) stack of per-aggregate nullspace rows.
    offs = np.arange(len(rows)) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    Bpad = np.zeros((nba, max_sz, ncols))
    Bpad[agg_of_row, offs] = B[rows]

    Q, R = np.linalg.qr(Bpad)                    # batched reduced QR

    # P[row, agg*ncols + j] = Q[agg, pos(row), j]
    data = Q[agg_of_row, offs]                   # (nrows, ncols)
    col0 = agg_of_row[:, None] * ncols + np.arange(ncols)[None, :]
    P = sp.csr_matrix(
        (data.ravel(), (np.repeat(rows, ncols), col0.ravel())),
        shape=(n, nba * ncols),
    )
    # Coarse nullspace: the stacked R factors (nba*ncols, ncols).
    return P, R.reshape(-1, ncols)
