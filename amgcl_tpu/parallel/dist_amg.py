"""Coupled distributed AMG over a device mesh (grid problems).

The block-Jacobi DistSolver preconditioner degrades iteration counts as
shards multiply; this module distributes the *actual* AMG hierarchy — the
mirror of mpi::amg (amgcl/mpi/amg.hpp:56-467) for structured problems:

* every level's matrix is a slab-sharded DIA (`DistDia`) — the V-cycle's
  SpMVs exchange two contiguous halos over ICI via `lax.ppermute`;
* the grid transfer operators are *shard-local* by construction: with
  slabs aligned to even x-extents, 2× box aggregates never straddle a
  shard boundary, so restriction/prolongation are local reshapes while
  the prolongation smoother S rides the same halo machinery;
* once a level's x-extent stops dividing evenly (or the level is small),
  the hierarchy transitions to a *replicated* tail: the residual is
  all_gathered and the remaining levels (incl. the dense coarse inverse)
  run redundantly on every shard — the TPU analogue of the reference's
  coarse-level consolidation onto master ranks
  (amgcl/mpi/direct_solver/solver_base.hpp:42-272) and of its shrinking
  active_procs per level (mpi/amg.hpp:430-467).

Iteration counts match the serial hierarchy exactly (same operators).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.formats import DiaMatrix
from ..precond.amg import Level, AMGParams, _cycle as serial_cycle
from ..precond.grid_setup import GridAMG
from .dist import DistDia, dist_spmv
from .. import relaxation as rlx
from ..relaxation.spai0 import SPAI0State
from ..relaxation.damped_jacobi import JacobiState
from ..relaxation.chebyshev import ChebyshevState


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A_data", "S_data", "St_data", "relax"],
    meta_fields=["offsets", "s_offsets", "st_offsets", "n", "fine_dims",
                 "coarse_dims", "axis"],
)
@dataclasses.dataclass(frozen=True)
class DistGridLevel:
    """One slab-sharded level (stacked over shards on axis 0 outside
    shard_map; per-shard blocks inside)."""

    A_data: jax.Array       # (S, D, n_loc) outside / (1, D, n_loc) inside
    S_data: jax.Array
    St_data: jax.Array
    relax: object           # smoother state with per-shard leading axis
    offsets: tuple
    s_offsets: tuple
    st_offsets: tuple
    n: int
    fine_dims: tuple
    coarse_dims: tuple
    axis: str


def _shard_dia_data(D: DiaMatrix, S: int):
    """(D, n) → (S, D, n_loc) without leaving the device (slab sharding
    of DIA data is a pure reshape)."""
    n = D.shape[0]
    data = D.data.reshape(len(D.offsets), S, n // S)
    return jnp.transpose(data, (1, 0, 2))


def _shard_relax_state(state, S: int):
    """Split a smoother state's n-sized vectors into per-shard slabs."""
    if isinstance(state, SPAI0State):
        return SPAI0State(m=state.m.reshape(S, -1))
    if isinstance(state, JacobiState):
        return JacobiState(
            inv_dia=state.inv_dia.reshape(S, -1),
            damping=jnp.broadcast_to(state.damping, (S,)),
        )
    if isinstance(state, ChebyshevState):
        return ChebyshevState(
            c=jnp.broadcast_to(state.c, (S,)),
            d=jnp.broadcast_to(state.d, (S,)),
            inv_dia=jnp.broadcast_to(
                state.inv_dia, (S,) + state.inv_dia.shape
            ) if state.inv_dia.size == 1 else state.inv_dia.reshape(S, -1),
            degree=state.degree,
            scale=state.scale,
        )
    raise ValueError(
        f"coupled distributed AMG supports SPAI0/Jacobi/Chebyshev "
        f"smoothers; got {type(state).__name__}"
    )


def _unshard_relax(state):
    """Inside shard_map: strip the leading (1,)-shard axis."""
    return jax.tree_util.tree_map(lambda x: x[0], state)


def build_dist_grid_amg(
    A, dims, S: int, *, axis="shard", relaxation=None,
    params: AMGParams | None = None, dtype=jnp.float32, **grid_kw,
):
    """Build the serial hierarchy (device-side probing), then shard levels
    while the slab stays aligned; returns (dist_levels, tail_levels, prm).
    """
    amg = GridAMG(A, dims, relaxation=relaxation, params=params,
                  dtype=dtype, **grid_kw)
    prm = amg.prm

    dist_levels = []
    tail = []
    sharded = True
    for lvl in amg.levels:
        if lvl.P is None:  # coarsest
            sharded = False
        if sharded:
            gt = lvl.P
            fdims = gt.fine_dims
            cdims = gt.coarse_dims
            ok = (
                fdims[0] % (2 * S) == 0
                and max(abs(o) for o in lvl.A.offsets) <= lvl.A.shape[0] // S
            )
            if not ok:
                sharded = False
        if not sharded:
            tail.append(lvl)
            continue
        dist_levels.append(
            DistGridLevel(
                A_data=_shard_dia_data(lvl.A, S),
                S_data=_shard_dia_data(gt.S, S),
                St_data=_shard_dia_data(gt.St, S),
                relax=_shard_relax_state(lvl.relax, S),
                offsets=lvl.A.offsets,
                s_offsets=gt.S.offsets,
                st_offsets=gt.St.offsets,
                n=lvl.A.shape[0],
                fine_dims=fdims,
                coarse_dims=cdims,
                axis=axis,
            )
        )
    return tuple(dist_levels), tuple(tail), prm


# ----------------------------------------------------------------------
# in-shard cycle
# ----------------------------------------------------------------------

def _local(lvl: DistGridLevel):
    """Per-shard DistDia views (inside shard_map, leading axis stripped)."""
    n = lvl.n
    mk = lambda data, offs: DistDia(
        data=data[0], offsets=offs, n=n, n_loc=data.shape[-1], axis=lvl.axis
    )
    return (
        mk(lvl.A_data, lvl.offsets),
        mk(lvl.S_data, lvl.s_offsets),
        mk(lvl.St_data, lvl.st_offsets),
        _unshard_relax(lvl.relax),
    )


def _relax_apply(state, A: DistDia, rhs, x=None):
    """SPAI0/Jacobi/Chebyshev sweeps against the distributed operator.
    ``x=None`` = zero initial guess: skips the A @ 0 SpMV *and its halo
    exchange* (bit-identical — A @ 0 is exactly 0, 0 + y is y — so
    dist-vs-serial iteration equality is untouched)."""
    from ..relaxation.spai0 import SPAI0State
    from ..relaxation.damped_jacobi import JacobiState
    from ..relaxation.chebyshev import ChebyshevState

    if isinstance(state, SPAI0State):
        if x is None:
            return state.m * rhs
        return x + state.m * (rhs - dist_spmv(A, x))
    if isinstance(state, JacobiState):
        if x is None:
            return state.damping * state.inv_dia * rhs
        return x + state.damping * state.inv_dia * (rhs - dist_spmv(A, x))
    if isinstance(state, ChebyshevState):
        c, d = state.c, state.d
        zero_guess = x is None
        if zero_guess:
            x = jnp.zeros_like(rhs)
        p = jnp.zeros_like(x)
        alpha = jnp.zeros_like(c)
        for k in range(state.degree):
            r = rhs if (k == 0 and zero_guess) else rhs - dist_spmv(A, x)
            if state.scale:
                r = state.inv_dia * r
            if k == 0:
                alpha = 1.0 / d
                beta = jnp.zeros_like(c)
            elif k == 1:
                alpha = 2.0 * d / (2.0 * d * d - c * c)
                beta = alpha * d - 1.0
            else:
                alpha = 1.0 / (d - 0.25 * alpha * c * c)
                beta = alpha * d - 1.0
            p = alpha * r + beta * p
            x = x + p
        return x
    from ..relaxation.ilu0 import ILUState, ilu_tri_solve

    if isinstance(state, ILUState):
        # Local-block ILU0 (the reference's MPI relaxation model: each
        # rank's smoother acts on its local diagonal block — block-Jacobi
        # between shards, ILU within; amgcl/mpi/relaxation/*.hpp).  The
        # residual rides the distributed operator; the triangular solves
        # are shard-local (L/U hold local column ids only).
        if x is None:
            return state.damping * ilu_tri_solve(state, rhs)
        r = rhs - dist_spmv(A, x)
        return x + state.damping * ilu_tri_solve(state, r)
    raise TypeError(type(state))


def _restrict_local(lvl: DistGridLevel, St: DistDia, rf_loc):
    """Down ∘ Sᵀ with a slab-local box sum (the x-slab extent is even by
    construction, so no cross-shard folding).  Folds run as MXU
    contractions (see coarsening.grid_aggregation._axis_fold)."""
    from ..coarsening.grid_aggregation import _axis_fold

    t = dist_spmv(St, rf_loc)
    fdims = lvl.fine_dims
    S_shards = lvl.n // St.n_loc
    loc_dims = (fdims[0] // S_shards,) + tuple(fdims[1:])
    x3 = t.reshape(loc_dims)
    for ax, fd in enumerate(loc_dims):
        x3 = _axis_fold(x3, fd, (fd + 1) // 2, ax)
    return x3.reshape(-1)


def _prolong_local(lvl: DistGridLevel, Sm: DistDia, xc_loc):
    from ..coarsening.grid_aggregation import _axis_expand

    cdims = lvl.coarse_dims
    fdims = lvl.fine_dims
    S_shards = lvl.n // Sm.n_loc
    cloc = (cdims[0] // S_shards,) + tuple(cdims[1:])
    floc = (fdims[0] // S_shards,) + tuple(fdims[1:])
    x3 = xc_loc.reshape(cloc)
    for ax, (fd, cd) in enumerate(zip(floc, cloc)):
        x3 = _axis_expand(x3, fd, cd, ax)
    return dist_spmv(Sm, x3.reshape(-1))


def dist_amg_apply(dist_levels, tail_levels, r_loc, prm: AMGParams,
                   axis: str):
    """Preconditioner application inside shard_map."""
    dt = (
        dist_levels[0].A_data.dtype if dist_levels
        else tail_levels[0].A.dtype
    )
    rr = r_loc.astype(dt)
    x = _dist_cycle(dist_levels, tail_levels, 0, rr, prm, axis)
    return x.astype(r_loc.dtype)


def _dist_cycle(dist_levels, tail, i, rhs, prm, axis):
    if i == len(dist_levels):
        # transition: replicate and run the serial tail identically
        r_full = jax.lax.all_gather(rhs, axis, tiled=True)
        x_full = serial_cycle(tail, 0, r_full, prm)
        S_shards = jax.lax.axis_size(axis)
        n_loc = rhs.shape[0]
        my = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice(x_full, (my * n_loc,), (n_loc,))

    lvl = dist_levels[i]
    A, Sm, St, relax = _local(lvl)
    x = None                    # zero guess: first sweep skips A @ 0
    for _ in range(prm.ncycle):
        for _ in range(prm.npre):
            x = _relax_apply(relax, A, rhs, x)
        if x is None:
            x = jnp.zeros_like(rhs)
        t = rhs - dist_spmv(A, x)
        rc = _restrict_local(lvl, St, t)
        xc = _dist_cycle(dist_levels, tail, i + 1, rc, prm, axis)
        x = x + _prolong_local(lvl, Sm, xc)
        for _ in range(prm.npost):
            x = _relax_apply(relax, A, rhs, x)
    return x
