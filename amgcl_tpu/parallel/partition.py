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


def partition_block_dia(A: sp.csr_matrix, S: int, block: int,
                        dtype=jnp.float32):
    """Stacked per-shard block-DIA slabs: returns
    (data (S, D, b, b, nb_loc), offsets).  Requires the halo (max block
    |offset|) to fit inside one shard's block rows."""
    from ..ops.formats import BlockDiaMatrix

    B = BlockDiaMatrix.from_scipy(A, block=block, dtype=dtype)
    n = A.shape[0]
    assert n % (S * block) == 0, "pad first"
    nb = n // block
    nb_loc = nb // S
    H = max(max(B.offsets), -min(B.offsets), 0) if B.offsets else 0
    if H > nb_loc:
        raise ValueError(
            f"block halo width {H} exceeds shard block rows {nb_loc}"
        )
    D = len(B.offsets)
    data = np.asarray(B.data).reshape(D, block, block, S, nb_loc)
    data = np.transpose(data, (3, 0, 1, 2, 4))   # (S, D, b, b, nb_loc)
    return jnp.asarray(data, dtype=dtype), B.offsets


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


def partition_ell_halo(M: sp.csr_matrix, S: int, block: int = 1,
                       dtype=jnp.float32, max_halo_frac: float = 1.0):
    """Window-local ELL partition for the `DistEllH` halo format.

    Rows are split into S equal slabs; column indices are rebased to each
    shard's window [slab_start - H, slab_end + H) where H (the halo, in
    block units) is the smallest uniform width covering every off-slab
    reference.  Returns (data (S,K,b,b,nbr_loc), cols (S,K,nbr_loc), H) or
    None when H would exceed ``max_halo_frac * nbc_loc`` (the two-neighbour
    exchange can only reach one slab away — fall back to all-gather then).

    The host-side analogue of building the reference's comm_pattern
    (amgcl/mpi/distributed_matrix.hpp:93-184), collapsed to two contiguous
    slab exchanges by the windowed renumbering.
    """
    M = sp.csr_matrix(M)
    nr, nc = M.shape
    b = block
    if nr % (S * b) or nc % (S * b):
        return None
    nbr_loc = nr // (S * b)
    nbc_loc = nc // (S * b)

    if b == 1:
        rows = np.repeat(np.arange(nr, dtype=np.int64), np.diff(M.indptr))
        bcols = M.indices.astype(np.int64)
        shard_of = rows // nbr_loc
    else:
        B = sp.bsr_matrix(M, blocksize=(b, b))
        B.sum_duplicates()
        nbr = nr // b
        rows = np.repeat(np.arange(nbr, dtype=np.int64), np.diff(B.indptr))
        bcols = B.indices.astype(np.int64)
        shard_of = rows // nbr_loc

    # halo: worst off-window reach over all nnz
    lo_reach = shard_of * nbc_loc - bcols            # >0 when col left of slab
    hi_reach = bcols - ((shard_of + 1) * nbc_loc - 1)  # >0 when right of slab
    H = int(max(lo_reach.max(initial=0), hi_reach.max(initial=0), 0))
    if H > int(max_halo_frac * nbc_loc):
        return None

    datas, colss = [], []
    K = 1
    mats = []
    for s in range(S):
        Ms = M[s * nbr_loc * b : (s + 1) * nbr_loc * b]
        Es = SparseMatrix.from_scipy(sp.csr_matrix(Ms), block=b, dtype=dtype)
        mats.append(Es)
        K = max(K, Es.width)
    for s, Es in enumerate(mats):
        d = np.asarray(Es.data)
        c = np.asarray(Es.cols).astype(np.int64)
        # padding entries carry col 0 / data 0: rebase them to the slab
        # start so the window-local index stays in range for every shard.
        pad_mask = (d == 0).all(axis=(1, 2))  # (K, nbr_loc)
        c = np.where(pad_mask, s * nbc_loc, c)
        c_local = c - s * nbc_loc + H
        assert c_local.min() >= 0 and c_local.max() < nbc_loc + 2 * H
        if Es.width < K:
            d = np.pad(d, ((0, K - Es.width), (0, 0), (0, 0), (0, 0)))
            c_local = np.pad(
                c_local, ((0, K - Es.width), (0, 0)), constant_values=H
            )
        datas.append(d)
        colss.append(c_local.astype(np.int32))
    return (
        jnp.asarray(np.stack(datas), dtype=dtype),
        jnp.asarray(np.stack(colss)),
        H,
    )


def make_dist_matrix(A: sp.csr_matrix, S: int, axis: str = "shard",
                     block: int = 1, dtype=jnp.float32):
    """Pick the distributed format and return (stacked_arrays, make_local)
    where make_local(per_shard_arrays) builds the in-shard_map view.

    Preference order: DIA slab-halo (banded, zero gathers) → halo-window
    ELL (two contiguous ppermutes, any pattern whose per-shard column
    window fits one slab) → all-gather ELL (always correct)."""
    from .dist import DistBlockDia, DistEllH

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

    if block > 1 and A.shape[0] == A.shape[1]:
        from ..ops.formats import block_dia_viable

        nb_loc = n_loc // block
        if block_dia_viable(A, block):
            try:
                data, offsets = partition_block_dia(A, S, block, dtype)
            except ValueError:
                data = None              # halo too wide → ELL paths
            if data is not None:
                def make_local(arrs):
                    (d,) = arrs
                    return DistBlockDia(
                        data=d, offsets=offsets, n=n, nb_loc=nb_loc,
                        block=block, axis=axis,
                    )

                return (data,), make_local

    halo = partition_ell_halo(A, S, block=block, dtype=dtype)
    if halo is not None:
        data, cols, H = halo
        nb_loc = n_loc // block

        def make_local(arrs):
            d, c = arrs
            return DistEllH(
                data=d, cols=c, n=n, nr_loc=nb_loc, nc_loc=nb_loc,
                halo=H, block=block, axis=axis,
            )

        return (data, cols), make_local

    data, cols = partition_ell(A, S, block=block, dtype=dtype)

    def make_local(arrs):
        d, c = arrs
        return DistEll(
            data=d, cols=c, n=n, n_loc=n_loc, block=block, axis=axis
        )

    return (data, cols), make_local
