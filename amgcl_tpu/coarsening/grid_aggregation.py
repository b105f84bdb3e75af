"""Grid-aligned smoothed aggregation — the TPU structured fast path.

For matrices that live on a logical (nx[, ny[, nz]]) grid (the reference's
benchmark problems are exactly these), aggregation into fixed 2^d boxes
makes every level a structured-grid operator again:

* every level matrix has a compact diagonal-offset set → DIA storage →
  SpMV is pure shift-multiply-add (zero gathers, HBM roofline);
* the transfer operators are matrix-free: P = S · Up, R = Down · Sᵀ, where
  Up/Down are 2× box upsample/downsample (reshape/repeat — dense ops) and
  S = (I − ω D⁻¹ A_F) is itself DIA.

This is this framework's answer to the reference's "setup on CPU, solve on
accelerator" split (amgcl/amg.hpp:355-360): the *algorithm* is the same
smoothed aggregation (Vanek) as coarsening/smoothed_aggregation.py — on a
structured grid the greedy sweep of the reference
(amgcl/coarsening/plain_aggregates.hpp:163) produces box aggregates in the
interior anyway — but the resulting operators are laid out so that the TPU
never executes a gather.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from .aggregates import Aggregates, strong_connections
from .tentative import tentative_prolongation
from .smoothed_aggregation import filtered_smoother, galerkin, spectral_radius
from ..ops.formats import DiaMatrix


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["S", "St"],
    meta_fields=["fine_dims", "coarse_dims"],
)
@dataclasses.dataclass(frozen=True)
class GridTransfer:
    """Matrix-free P/R pair for one level: P x = S · Up(x), R y = Down(Sᵀ y).

    S is the prolongation smoother (I − ω D⁻¹ A_F) in DIA; St its
    transpose.  Up repeats each grid axis 2× (trimmed to the fine dims);
    Down sums 2^d boxes (padded when a fine dim is odd)."""

    S: DiaMatrix | None
    St: DiaMatrix | None
    fine_dims: tuple
    coarse_dims: tuple

    def prolong(self, xc: jax.Array, out_len: int | None = None) -> jax.Array:
        """``out_len`` > n_fine keeps the result in the caller's padded
        Krylov layout; padding happens BEFORE the S SpMV so it runs the
        zero-copy padded kernel."""
        x3 = xc.reshape(self.coarse_dims)
        for ax, (fd, cd) in enumerate(zip(self.fine_dims, self.coarse_dims)):
            x3 = _axis_expand(x3, fd, cd, ax)
        xf = x3.reshape(-1)
        if out_len is not None and out_len != xf.shape[0]:
            xf = jnp.pad(xf, (0, out_len - xf.shape[0]))
        if self.S is not None:
            from ..ops.spmv import spmv
            xf = spmv(self.S, xf)
        return xf

    def restrict(self, rf: jax.Array) -> jax.Array:
        if self.St is not None:
            from ..ops.spmv import spmv
            rf = spmv(self.St, rf)          # padded-layout aware
        n_f = int(np.prod(self.fine_dims))
        if rf.shape[0] != n_f:
            # leave the padded Krylov layout at the level boundary: the
            # coarse levels are small enough that exact-length vectors
            # (and their internal kernel pads) cost nothing
            rf = jax.lax.slice(rf, (0,), (n_f,))
        x3 = rf.reshape(self.fine_dims)
        for ax, (fd, cd) in enumerate(zip(self.fine_dims, self.coarse_dims)):
            x3 = _axis_fold(x3, fd, cd, ax)
        return x3.reshape(-1)


def _fold_matrix(fd: int, cd: int, dtype):
    """(fd, cd) 0/1 matrix mapping fine index i to coarse i//2."""
    F = np.zeros((fd, cd), dtype=np.dtype(dtype))
    F[np.arange(fd), np.arange(fd) // 2] = 1.0
    return jnp.asarray(F)


def _axis_fold(x, fd: int, cd: int, axis: int):
    """Box-fold one axis (pairs summed) as an MXU contraction.

    Reshape-sum folds force relayouts of unaligned 3D arrays (the grid
    extents are rarely multiples of the 128-lane tiling); a contraction
    with the 0/1 fold matrix runs on the MXU instead — ~4x faster on the
    fine level.  Precision HIGHEST keeps the sums exact in f32."""
    F = _fold_matrix(fd, cd, x.dtype)
    y = jnp.tensordot(x, F, axes=([axis], [0]),
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def _axis_expand(x, fd: int, cd: int, axis: int):
    """Adjoint of _axis_fold: repeat each coarse entry into its fine pair
    (trimmed to fd) via the transposed fold matrix on the MXU."""
    F = _fold_matrix(fd, cd, x.dtype)
    y = jnp.tensordot(x, F, axes=([axis], [1]),
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def grid_aggregate_ids(dims) -> tuple[np.ndarray, tuple]:
    """Aggregate id per fine node for 2^d box aggregation, coarse-
    lexicographic numbering; returns (ids, coarse_dims)."""
    cdims = tuple((d + 1) // 2 for d in dims)
    grids = np.meshgrid(*[np.arange(d) // 2 for d in dims], indexing="ij")
    ids = np.zeros(tuple(dims), dtype=np.int64)
    for g, cd in zip(grids, cdims):
        ids = ids * cd + g
    return ids.reshape(-1), cdims


@dataclasses.dataclass
class GridAggregation:
    """Smoothed (or plain) aggregation on a logical grid.

    dims: the fine grid shape (product must equal the matrix size).
    Produces scipy P/R for the host-side Galerkin product exactly like the
    generic coarsenings, plus a matrix-free GridTransfer for the device.
    """

    dims: tuple = ()
    relax: float = 1.0
    smooth: bool = True
    eps_strong: float = 0.08
    estimate_spectral_radius: bool = False
    power_iters: int = 0

    def transfer_operators(self, A: sp.csr_matrix):
        n = A.shape[0]
        dims = tuple(self.dims)
        if int(np.prod(dims)) != n:
            raise ValueError(f"grid dims {dims} do not match matrix size {n}")

        ids, cdims = grid_aggregate_ids(dims)
        count = int(np.prod(cdims))
        strong = strong_connections(A, self.eps_strong)
        aggr = Aggregates(count=count, id=ids, strong=strong)
        P_tent, _ = tentative_prolongation(n, aggr)

        self._last_transfer = None
        if self.smooth:
            omega = self.relax
            if self.estimate_spectral_radius:
                omega *= (4.0 / 3.0) / spectral_radius(A, self.power_iters)
            else:
                omega *= 2.0 / 3.0
            S = filtered_smoother(A, aggr, omega)
            P = (S @ P_tent).tocsr()
            self._S_host = S
        else:
            P = P_tent.tocsr()
            self._S_host = None
        P.sum_duplicates()
        self._fine_dims = dims
        self._coarse_dims = cdims
        self.dims = cdims       # next level coarsens the coarse grid
        self.eps_strong *= 0.5
        return P, P.T.tocsr()

    def coarse_operator(self, A, P, R):
        return galerkin(A, P, R)

    def device_transfer(self, dtype):
        """Matrix-free device-side P/R for the level just built.  Sᵀ comes
        from the analytic DIA transpose (no second conversion pass)."""
        if self._S_host is not None:
            S = DiaMatrix.from_scipy(self._S_host, dtype=dtype)
            St = S.transpose()
        else:
            S = St = None
        return GridTransfer(
            S=S, St=St,
            fine_dims=self._fine_dims,
            coarse_dims=self._coarse_dims,
        )
