"""Coupled distributed AMG for *general* matrices — the SPMD mirror of
mpi::amg (amgcl/mpi/amg.hpp:56-467) with any coarsening.

Design (TPU-first, not a port):

* Setup runs on the host exactly like the reference's CPU setup phase
  (amgcl/amg.hpp:351-365 "move to backend") — the *global* hierarchy is
  built once with any serial coarsening (SA / RS / energy-min / PMIS),
  so iteration counts match the serial solver bit-for-bit; the reference
  instead re-derives aggregates with distributed PMIS because no rank
  holds the whole matrix (mpi/coarsening/pmis.hpp) — on a TPU pod the
  host-side builder plays that role and the *solve phase* is what scales.
* Every level's operators (A, P, R) are then row-sharded over the mesh
  axis.  The halo-window `DistEllH` format turns the reference's
  comm_pattern index lists into two contiguous `lax.ppermute` slab
  exchanges; levels whose bandwidth exceeds a slab fall back to the
  all-gather `DistEll` form.
* Rows that don't divide the shard count are padded with identity rows
  (A), zero rows/columns (P, R) — padded entries stay exactly zero
  through relaxation, transfers and reductions.
* The coarse tail (small levels + the dense coarse inverse) is
  replicated on every shard — the analogue of the reference's
  coarse-level consolidation onto master ranks
  (amgcl/mpi/direct_solver/solver_base.hpp:42-272).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ..precond.amg import AMG, AMGParams, _cycle as serial_cycle
from .dist import DistEll, DistEllH, dist_spmv
from .dist_amg import _relax_apply
from .partition import partition_ell_halo, partition_ell
from ..relaxation.spai0 import SPAI0State
from ..relaxation.damped_jacobi import JacobiState
from ..relaxation.chebyshev import ChebyshevState


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A_arrs", "P_arrs", "R_arrs", "relax"],
    meta_fields=["A_meta", "P_meta", "R_meta", "axis", "nc_pad", "nc_true"],
)
@dataclasses.dataclass(frozen=True)
class DistGenLevel:
    """One row-sharded level.  ``*_arrs`` are stacked (S, ...) outside
    shard_map / per-shard with a length-1 leading axis inside; ``*_meta``
    describes how to rebuild the distributed operator view."""

    A_arrs: tuple
    P_arrs: tuple
    R_arrs: tuple
    relax: object
    A_meta: tuple
    P_meta: tuple
    R_meta: tuple
    axis: str
    nc_pad: int
    nc_true: int


def _mk_local(arrs, meta, axis):
    """Rebuild the per-shard distributed-matrix view (inside shard_map,
    leading shard axis already stripped)."""
    kind = meta[0]
    if kind == "ellh":
        _, n, nr_loc, nc_loc, halo, block = meta
        data, cols = arrs
        return DistEllH(
            data=data, cols=cols, n=n, nr_loc=nr_loc, nc_loc=nc_loc,
            halo=halo, block=block, axis=axis,
        )
    if kind == "ell":
        _, n, n_loc, block = meta
        data, cols = arrs
        return DistEll(
            data=data, cols=cols, n=n, n_loc=n_loc, block=block, axis=axis
        )
    raise ValueError(kind)


def _partition_op(M: sp.csr_matrix, S: int, dtype) -> tuple:
    """Row-shard one operator: halo window when it fits, all-gather
    otherwise.  Returns (arrs, meta)."""
    nr, nc = M.shape
    res = partition_ell_halo(M, S, block=1, dtype=dtype)
    if res is not None:
        data, cols, H = res
        return (data, cols), ("ellh", nc, nr // S, nc // S, H, 1)
    data, cols = partition_ell(M, S, block=1, dtype=dtype)
    return (data, cols), ("ell", nc, nr // S, 1)


def _pad_csr(M: sp.spmatrix, nr_pad: int, nc_pad: int, identity: bool):
    """Grow M to (nr_pad, nc_pad); identity=True puts 1s on the padded
    diagonal (A-levels), False pads with structural zeros (P/R)."""
    nr, nc = M.shape
    M = sp.csr_matrix(M)
    if nr == nr_pad and nc == nc_pad:
        return M
    indptr = np.concatenate(
        [M.indptr, np.full(nr_pad - nr, M.indptr[-1], dtype=M.indptr.dtype)]
    )
    out = sp.csr_matrix((M.data, M.indices, indptr), shape=(nr_pad, nc_pad))
    if identity and nr_pad > nr:
        ii = np.arange(nr, min(nr_pad, nc_pad))
        out = (out + sp.csr_matrix(
            (np.ones(len(ii)), (ii, ii)), shape=(nr_pad, nc_pad)
        )).tocsr()
    return out


def _shard_relax_padded(state, n_true: int, n_pad: int, S: int):
    """Pad a smoother state's n-vectors with zeros to n_pad, then split
    into per-shard slabs (leading S axis).  Zero entries make padded rows
    inert (their residual is identically zero)."""
    def padvec(v):
        v = jnp.asarray(v)
        if v.ndim == 1 and v.shape[0] == n_true:
            v = jnp.pad(v, (0, n_pad - n_true))
            return v.reshape(S, -1)
        return jnp.broadcast_to(v, (S,) + v.shape)

    if isinstance(state, SPAI0State):
        return SPAI0State(m=padvec(state.m))
    if isinstance(state, JacobiState):
        return JacobiState(
            inv_dia=padvec(state.inv_dia), damping=padvec(state.damping)
        )
    if isinstance(state, ChebyshevState):
        return ChebyshevState(
            c=padvec(state.c), d=padvec(state.d),
            inv_dia=padvec(state.inv_dia),
            degree=state.degree, scale=state.scale,
        )
    raise ValueError(
        f"coupled distributed AMG shards SPAI0/Jacobi/Chebyshev smoother "
        f"state; got {type(state).__name__} (ILU/GS act on the local "
        f"block via DistSolver(precond='amg') — the reference's MPI "
        f"relaxation semantics, amgcl/mpi/relaxation/)"
    )


def build_dist_general_amg(
    A, S: int, *, axis: str = "shard", coarsening=None, relaxation=None,
    params: AMGParams | None = None, dtype=jnp.float32,
    min_loc: int = 256, block: int = 1,
):
    """Build the serial hierarchy, then shard each level row-wise while
    the level is large enough; returns (dist_levels, tail_levels, prm).

    Iteration counts are identical to the serial `AMG` on the same matrix
    (the operators are the same; only their layout is distributed).
    """
    amg = AMG(A, coarsening=coarsening, relaxation=relaxation,
              params=params, dtype=dtype, block=block)
    prm = amg.prm

    dist_levels = []
    tail_start = 0
    for i, (lvl, (A_h, P_h, R_h)) in enumerate(zip(amg.levels, amg._host_ops)):
        if P_h is None or A_h.shape[0] < S * min_loc:
            break
        nf = A_h.shape[0]
        nc = P_h.shape[1]
        nf_pad = ((nf + S - 1) // S) * S
        nc_pad = ((nc + S - 1) // S) * S
        A_pad = _pad_csr(A_h, nf_pad, nf_pad, identity=True)
        P_pad = _pad_csr(P_h, nf_pad, nc_pad, identity=False)
        R_pad = _pad_csr(R_h, nc_pad, nf_pad, identity=False)
        A_arrs, A_meta = _partition_op(A_pad, S, dtype)
        P_arrs, P_meta = _partition_op(P_pad, S, dtype)
        R_arrs, R_meta = _partition_op(R_pad, S, dtype)
        relax = _shard_relax_padded(lvl.relax, nf, nf_pad, S)
        dist_levels.append(
            DistGenLevel(
                A_arrs=A_arrs, P_arrs=P_arrs, R_arrs=R_arrs, relax=relax,
                A_meta=A_meta, P_meta=P_meta, R_meta=R_meta, axis=axis,
                nc_pad=nc_pad, nc_true=nc,
            )
        )
        tail_start = i + 1

    tail = tuple(amg.levels[tail_start:])
    if not tail:
        raise AssertionError("coarsest level must stay in the tail")
    return tuple(dist_levels), tail, prm


# ----------------------------------------------------------------------
# in-shard cycle
# ----------------------------------------------------------------------

def _unstack(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _gen_cycle(dist_levels, tail, i, rhs, prm: AMGParams, axis: str):
    if i == len(dist_levels):
        # Replicated tail: gather the (padded) residual, run the serial
        # cycle identically on every shard, scatter my slab back.
        r_full = jax.lax.all_gather(rhs, axis, tiled=True)
        n_true = tail[0].A.shape[0]
        x_full = serial_cycle(tail, 0, r_full[:n_true], prm)
        pad = r_full.shape[0] - n_true
        if pad:
            x_full = jnp.pad(x_full, (0, pad))
        n_loc = rhs.shape[0]
        my = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice(x_full, (my * n_loc,), (n_loc,))

    lvl = dist_levels[i]
    A = _mk_local(tuple(a[0] for a in lvl.A_arrs), lvl.A_meta, axis)
    Pm = _mk_local(tuple(a[0] for a in lvl.P_arrs), lvl.P_meta, axis)
    Rm = _mk_local(tuple(a[0] for a in lvl.R_arrs), lvl.R_meta, axis)
    relax = _unstack(lvl.relax)
    x = None                    # zero guess: first sweep skips A @ 0
    for _ in range(prm.ncycle):
        for _ in range(prm.npre):
            x = _relax_apply(relax, A, rhs, x)
        if x is None:
            x = jnp.zeros_like(rhs)
        t = rhs - dist_spmv(A, x)
        rc = dist_spmv(Rm, t)
        xc = _gen_cycle(dist_levels, tail, i + 1, rc, prm, axis)
        x = x + dist_spmv(Pm, xc)
        for _ in range(prm.npost):
            x = _relax_apply(relax, A, rhs, x)
    return x


def dist_general_apply(dist_levels, tail, r_loc, prm: AMGParams, axis: str):
    """Preconditioner application inside shard_map (mixed-precision
    coupling as in the serial amg_apply)."""
    if dist_levels:
        dt = jax.tree_util.tree_leaves(dist_levels[0].A_arrs)[0].dtype
    else:
        dt = tail[0].A.dtype
    rr = r_loc.astype(dt)
    x = _gen_cycle(dist_levels, tail, 0, rr, prm, axis)
    return x.astype(r_loc.dtype)
