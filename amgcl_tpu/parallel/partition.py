"""Host-side row partitioning for the SPMD layer.

The analogue of building the reference's distributed_matrix from a row
strip (amgcl/mpi/distributed_matrix.hpp:370-436), done once on the host:
rows are split into equal slabs (padded with identity rows when the size
is not divisible — padded entries stay exactly zero through the whole
solve, so reductions are unaffected).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from ..ops.formats import DiaMatrix, SparseMatrix, dia_viable
from .dist import DistDia, DistEll


def pad_to_multiple(A: sp.csr_matrix, rhs: np.ndarray | None, S: int):
    """Pad A with identity rows (and rhs with zeros) to a multiple of S."""
    n = A.shape[0]
    pad = (-n) % S
    if pad == 0:
        return sp.csr_matrix(A), rhs, n
    Ap = sp.block_diag([A, sp.eye(pad)], format="csr")
    rp = None if rhs is None else np.concatenate([rhs, np.zeros(pad)])
    return Ap, rp, n


def partition_dia(A: sp.csr_matrix, S: int, dtype=jnp.float32):
    """Stacked per-shard DIA blocks: returns (data (S, D, n_loc), offsets).

    Requires the halo width (max |offset|) to fit inside one shard."""
    D = DiaMatrix.from_scipy(A, dtype=dtype)
    n = A.shape[0]
    assert n % S == 0, "pad first"
    n_loc = n // S
    H = max(max(D.offsets), -min(D.offsets), 0) if D.offsets else 0
    if H > n_loc:
        raise ValueError(
            f"halo width {H} exceeds shard size {n_loc}; "
            "use fewer shards or the ELL partition"
        )
    data = np.asarray(D.data).reshape(len(D.offsets), S, n_loc)
    data = np.transpose(data, (1, 0, 2))  # (S, D, n_loc)
    return jnp.asarray(data, dtype=dtype), D.offsets


def partition_ell(A: sp.csr_matrix, S: int, block: int = 1, dtype=jnp.float32):
    """Stacked per-shard ELL blocks with *global* columns:
    returns (data (S, K, b, b, nb_loc), cols (S, K, nb_loc))."""
    n = A.shape[0]
    assert n % S == 0, "pad first"
    n_loc = n // S
    shards = []
    K = 0
    for s in range(S):
        As = sp.csr_matrix(A[s * n_loc : (s + 1) * n_loc])
        M = SparseMatrix.from_scipy(As, block=block, dtype=dtype)
        shards.append(M)
        K = max(K, M.width)
    datas, colss = [], []
    for M in shards:
        d = np.asarray(M.data)
        c = np.asarray(M.cols)
        if M.width < K:
            d = np.pad(d, ((0, K - M.width), (0, 0), (0, 0), (0, 0)))
            c = np.pad(c, ((0, K - M.width), (0, 0)))
        datas.append(d)
        colss.append(c)
    return (
        jnp.asarray(np.stack(datas), dtype=dtype),
        jnp.asarray(np.stack(colss)),
    )


def make_dist_matrix(A: sp.csr_matrix, S: int, axis: str = "shard",
                     block: int = 1, dtype=jnp.float32):
    """Pick the distributed format (DIA slab-halo when viable, ELL
    all-gather otherwise) and return (stacked_arrays, make_local) where
    make_local(per_shard_arrays) builds the in-shard_map matrix view."""
    n = A.shape[0]
    n_loc = n // S
    use_dia = block == 1 and dia_viable(A)
    if use_dia:
        D = DiaMatrix.from_scipy(A, dtype=dtype)
        H = max(max(D.offsets), -min(D.offsets), 0) if D.offsets else 0
        use_dia = H <= n_loc
    if use_dia:
        data, offsets = partition_dia(A, S, dtype)

        def make_local(arrs):
            (d,) = arrs
            return DistDia(data=d, offsets=offsets, n=n, n_loc=n_loc, axis=axis)

        return (data,), make_local

    data, cols = partition_ell(A, S, block=block, dtype=dtype)

    def make_local(arrs):
        d, c = arrs
        return DistEll(
            data=d, cols=c, n=n, n_loc=n_loc, block=block, axis=axis
        )

    return (data, cols), make_local
