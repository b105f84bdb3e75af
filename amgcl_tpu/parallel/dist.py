"""Distributed (SPMD) layer — the TPU-native mirror of amgcl/mpi/.

The reference distributes by 1D row partition of the matrix with an MPI
halo exchange overlapped with local SpMV
(amgcl/mpi/distributed_matrix.hpp:317-557).  Here the same row partition
is expressed over a `jax.sharding.Mesh` axis with `shard_map`:

* **DistDia** — banded/structured matrices: the halo is two contiguous
  slabs exchanged with `lax.ppermute` (the comm_pattern of the reference
  collapses to two neighbour permutes because the DIA layout makes the
  boundary contiguous); local compute is the same shift-multiply SpMV,
  and XLA's async collectives overlap the permute with interior work.
* **DistEll** — general matrices: ghost values via `lax.all_gather`
  (correct for any pattern; the optimized bucketed exchange arrives with
  the distributed SpGEMM work).
* dots are `lax.psum` reductions — the InnerProduct policy hook of the
  reference (amgcl/mpi/inner_product.hpp:44-67).

Everything here runs *inside* shard_map; the host-side partitioners live
in partition.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.formats import SparseMatrix, DiaMatrix


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "n", "n_loc", "axis"],
)
@dataclasses.dataclass(frozen=True)
class DistDia:
    """Row-partitioned DIA matrix (per-shard view inside shard_map).

    data: (D, n_loc) — this shard's rows.  Offsets are global (col - row),
    bounded by the halo width H = max|offset| <= n_loc."""

    data: jax.Array
    offsets: tuple
    n: int
    n_loc: int
    axis: str

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def halo(self) -> int:
        return max(max(self.offsets), -min(self.offsets), 0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols"],
    meta_fields=["n", "n_loc", "block", "axis"],
)
@dataclasses.dataclass(frozen=True)
class DistEll:
    """Row-partitioned block-ELL with *global* column indices; ghost values
    come from an all_gather of x."""

    data: jax.Array   # (K, b, b, nb_loc)
    cols: jax.Array   # (K, nb_loc) global block columns
    n: int
    n_loc: int
    block: int
    axis: str


def dist_spmv(A, x_loc: jax.Array) -> jax.Array:
    """y_loc = (A @ x)_loc, running per-shard inside shard_map."""
    if isinstance(A, DistDia):
        H = A.halo
        n_loc = A.n_loc
        dt = A.data.dtype
        xc = x_loc.astype(dt)
        if H == 0:
            x_ext = xc
        else:
            ndev = jax.lax.axis_size(A.axis)
            # halo slabs: my last H rows go right; my first H rows go left.
            right_perm = [(i, i + 1) for i in range(ndev - 1)]
            left_perm = [(i + 1, i) for i in range(ndev - 1)]
            from_left = jax.lax.ppermute(xc[-H:], A.axis, right_perm)
            from_right = jax.lax.ppermute(xc[:H], A.axis, left_perm)
            x_ext = jnp.concatenate([from_left, xc, from_right])
        y = jnp.zeros(n_loc, dtype=dt)
        H_ = H
        for k, d in enumerate(A.offsets):
            seg = jax.lax.slice(x_ext, (H_ + d,), (H_ + d + n_loc,))
            y = y + A.data[k] * seg
        return y.astype(x_loc.dtype)

    if isinstance(A, DistEll):
        x_full = jax.lax.all_gather(x_loc, A.axis, tiled=True)  # (n,)
        K, b, _, nb_loc = A.data.shape
        dt = A.data.dtype
        xc = x_full.astype(dt)
        if b == 1:
            xg = xc[A.cols]
            y = jnp.sum(A.data[:, 0, 0, :] * xg, axis=0)
            return y.astype(x_loc.dtype)
        xb = xc.reshape(-1, b)
        xg = xb[A.cols]
        y = jnp.einsum("kabn,knb->na", A.data, xg)
        return y.reshape(-1).astype(x_loc.dtype)

    raise TypeError(f"not a distributed matrix: {type(A)}")
