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
* **DistEllH** — general matrices with a bounded per-shard column
  window: indices are rebased to the window at setup and ghost values
  arrive as the same two contiguous slab permutes (the reference's
  index-list comm_pattern collapsed to what ICI wants).
* **DistEll** — unbounded patterns: ghost values via `lax.all_gather`
  (always correct; the fallback).
* dots are `lax.psum` reductions — the InnerProduct policy hook of the
  reference (amgcl/mpi/inner_product.hpp:44-67).

Everything here runs *inside* shard_map; the host-side partitioners live
in partition.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp



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
    come from an all_gather of x.

    Supports rectangular operators: ``n`` is the *global column* count (the
    length of the gathered input), ``n_loc`` the local row-slab size."""

    data: jax.Array   # (K, b, b, nb_loc)
    cols: jax.Array   # (K, nb_loc) global block columns
    n: int
    n_loc: int
    block: int
    axis: str


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols"],
    meta_fields=["n", "nr_loc", "nc_loc", "halo", "block", "axis"],
)
@dataclasses.dataclass(frozen=True)
class DistEllH:
    """Row-partitioned block-ELL with *window-local* column indices — the
    TPU-native comm_pattern (reference: amgcl/mpi/distributed_matrix.hpp:51-314).

    The reference exchanges ghost values through per-neighbour index lists
    built with MPI_Alltoall.  Here the exchange is two contiguous slabs of
    ``halo`` block-rows moved with `lax.ppermute` (left + right neighbour) —
    contiguity is what ICI wants, and any matrix whose per-shard column
    window fits in [slab - halo, slab + halo) qualifies (always true after a
    bandwidth-reducing reorder; the builder falls back to `DistEll`
    otherwise).  Column indices are rebased at setup so the gather runs on
    the concatenated [left-halo | local | right-halo] extended vector with
    no index arithmetic on the hot path.

    Rectangular operators are supported: rows are sharded as ``nr_loc`` row
    slabs while the input vector is sharded as ``nc_loc`` column slabs
    (restriction/prolongation shard fine and coarse vectors differently).
    """

    data: jax.Array   # (K, b, b, nbr_loc)
    cols: jax.Array   # (K, nbr_loc) — block cols into the extended window
    n: int            # global column count (scalar)
    nr_loc: int       # local rows (scalar)
    nc_loc: int       # local input slab (scalar)
    halo: int         # halo width in *block* units
    block: int
    axis: str


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "n", "nb_loc", "block", "axis"],
)
@dataclasses.dataclass(frozen=True)
class DistBlockDia:
    """Row-partitioned block-DIA matrix — the block-value counterpart of
    DistDia (reference block paths: amgcl/mpi/ runs static_matrix blocks
    throughout, e.g. mpi/relaxation/spai0.hpp).  data[k,:,:,i] couples
    local block-row i to global block-column (row + offsets[k]); the halo
    is max|offset| block rows = halo*b scalars, exchanged as the same two
    contiguous slab ppermutes as DistDia."""

    data: jax.Array       # (D, b, b, nb_loc)
    offsets: tuple        # block-unit diagonals (global col - row)
    n: int                # global scalar size
    nb_loc: int           # local block rows
    block: int
    axis: str

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def halo(self) -> int:
        """Halo in block rows."""
        return max(max(self.offsets), -min(self.offsets), 0)


def _exchange_halo(xc: jax.Array, H: int, axis: str) -> jax.Array:
    """[left-halo | local | right-halo] via two contiguous slab permutes
    (edge shards receive zeros — the Dirichlet-consistent boundary)."""
    if H == 0:
        return xc
    ndev = jax.lax.axis_size(axis)
    right_perm = [(i, i + 1) for i in range(ndev - 1)]
    left_perm = [(i + 1, i) for i in range(ndev - 1)]
    from_left = jax.lax.ppermute(xc[-H:], axis, right_perm)
    from_right = jax.lax.ppermute(xc[:H], axis, left_perm)
    return jnp.concatenate([from_left, xc, from_right])


def dist_spmv(A, x_loc: jax.Array) -> jax.Array:
    """y_loc = (A @ x)_loc, running per-shard inside shard_map."""
    if isinstance(A, DistDia):
        H = A.halo
        n_loc = A.n_loc
        dt = A.data.dtype
        xc = x_loc.astype(dt)
        x_ext = _exchange_halo(xc, H, A.axis)
        from ..ops.spmv import _pallas_ok
        from ..ops.pallas_spmv import prehalo_viable

        if (dt in (jnp.float32, jnp.bfloat16) and _pallas_ok()
                and prehalo_viable(len(A.offsets), H, dt.itemsize)):
            # Per-shard streaming kernel — the local compute of the
            # multi-chip hot path (XLA overlaps it with the ppermutes).
            from ..ops.pallas_spmv import spmv_dia_prehalo_pallas

            y = spmv_dia_prehalo_pallas(
                A.data, A.offsets, x_ext, H, n_loc
            )
            return y.astype(x_loc.dtype)
        y = jnp.zeros(n_loc, dtype=dt)
        H_ = H
        for k, d in enumerate(A.offsets):
            seg = jax.lax.slice(x_ext, (H_ + d,), (H_ + d + n_loc,))
            y = y + A.data[k] * seg
        return y.astype(x_loc.dtype)

    if isinstance(A, DistBlockDia):
        D, b, _, nb_loc = A.data.shape
        dt = A.data.dtype
        H = A.halo
        xc = x_loc.astype(dt)
        x_ext = _exchange_halo(xc, H * b, A.axis)        # scalars
        xb = x_ext.reshape(nb_loc + 2 * H, b).T          # (b, nb_ext)
        ys = [jnp.zeros(nb_loc, dtype=dt) for _ in range(b)]
        for k, d in enumerate(A.offsets):
            seg = jax.lax.slice(xb, (0, H + d), (b, H + d + nb_loc))
            for a in range(b):
                acc = ys[a]
                for c in range(b):
                    acc = acc + A.data[k, a, c] * seg[c]
                ys[a] = acc
        return jnp.stack(ys).T.reshape(-1).astype(x_loc.dtype)

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

    if isinstance(A, DistEllH):
        K, b, _, nbr_loc = A.data.shape
        dt = A.data.dtype
        xc = x_loc.astype(dt)
        H = A.halo * b           # halo in scalars
        x_ext = _exchange_halo(xc, H, A.axis)
        if b == 1:
            xg = x_ext[A.cols]
            y = jnp.sum(A.data[:, 0, 0, :] * xg, axis=0)
            return y.astype(x_loc.dtype)
        xb = x_ext.reshape(-1, b)
        xg = xb[A.cols]
        y = jnp.einsum("kabn,knb->na", A.data, xg)
        return y.reshape(-1).astype(x_loc.dtype)

    raise TypeError(f"not a distributed matrix: {type(A)}")


def dist_spectral_radius(A, dia_loc: jax.Array, axis: str, iters: int = 20,
                         scale: bool = True) -> jax.Array:
    """Power-method estimate of ρ(D⁻¹A) (or ρ(A) with scale=False) against
    a distributed operator — runs inside shard_map; every SpMV rides the
    halo exchange and every norm is a psum reduction.

    The SPMD mirror of the reference's distributed spectral_radius
    (amgcl/mpi/distributed_matrix.hpp:1109-1290), used by distributed
    smoothed aggregation and Chebyshev setup.
    """
    n_loc = dia_loc.shape[0]
    my = jax.lax.axis_index(axis)
    # deterministic per-shard pseudo-random start (hash of global index)
    gi = my * n_loc + jnp.arange(n_loc)
    b0 = jnp.sin(gi.astype(dia_loc.dtype) * 12.9898) * 43758.5453
    b0 = b0 - jnp.floor(b0) - 0.5
    inv_d = jnp.where(dia_loc != 0, 1.0 / dia_loc, 0.0) if scale else None

    def body(_, carry):
        b, rho = carry
        nrm = jnp.sqrt(jax.lax.psum(jnp.sum(b * b), axis))
        b = b / nrm
        Ab = dist_spmv(A, b)
        if scale:
            Ab = inv_d * Ab
        rho = jax.lax.psum(jnp.sum(b * Ab), axis)
        return Ab, rho

    _, rho = jax.lax.fori_loop(
        0, iters, body, (b0, jnp.zeros((), dtype=dia_loc.dtype))
    )
    return rho
