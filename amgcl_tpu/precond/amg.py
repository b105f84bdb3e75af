"""The algebraic multigrid hierarchy.

Capability parity with the reference amg class (amgcl/amg.hpp:68-557):
params {coarse_enough, direct_coarse, max_levels, npre, npost, ncycle,
pre_cycles}, per-level {A, P, R, relax}, V/W cycles, a direct solve on the
coarsest level, hierarchy report, and rebuild() (reuse P/R for a matrix
with new coefficients, amg.hpp:229-269).

TPU-native design differences from the reference:

* the whole cycle is one pure jittable function over a *tuple of Level
  pytrees* — level count and shapes are static, recursion is unrolled at
  trace time, and the complete Krylov+AMG solve compiles to a single XLA
  executable (the reference round-trips to the host for every backend
  primitive);
* the coarse direct solver is a dense factorization applied as a dense
  matvec — an MXU-friendly replacement for the reference's serial
  skyline LU (amgcl/solver/skyline_lu.hpp:85-247).  A triangular-solve
  path would serialize on TPU, so the inverse is formed once at setup;
* mixed precision is a dtype policy: the hierarchy defaults to float32
  while the outer Krylov runs float64, the same coupling as the
  reference's mixed_precision example (examples/mixed_precision.cpp).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.formats import SparseMatrix, from_scipy_auto
from ..ops.spmv import spmv
from .. import relaxation as rlx
from ..coarsening.smoothed_aggregation import SmoothedAggregation
from ..coarsening.grid_aggregation import GridTransfer


def _prolong(P, x, out_len=None):
    if isinstance(P, GridTransfer):
        return P.prolong(x, out_len=out_len)
    return spmv(P, x)


def _restrict(R, x):
    if isinstance(R, GridTransfer):
        return R.restrict(x)
    return spmv(R, x)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "P", "R", "relax", "coarse_inv"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Level:
    A: SparseMatrix
    P: SparseMatrix | None
    R: SparseMatrix | None
    relax: object | None
    coarse_inv: jax.Array | None


@dataclasses.dataclass
class AMGParams:
    coarse_enough: int = 3000
    direct_coarse: bool = True
    max_levels: int = 32
    npre: int = 1
    npost: int = 1
    ncycle: int = 1          # 1 = V-cycle, 2 = W-cycle
    pre_cycles: int = 1


class AMG:
    """Host-side hierarchy builder + functional cycle.

    ``AMG(A_scipy, coarsening=..., relaxation=..., params=...)`` builds on
    the host; `.levels` is the device pytree; `.apply` / `amg_cycle` are
    pure functions usable inside jit.
    """

    def __init__(
        self,
        A: sp.spmatrix,
        coarsening=None,
        relaxation=None,
        params: AMGParams | None = None,
        block: int = 1,
        dtype=jnp.float32,
    ):
        import copy

        self.prm = params or AMGParams()
        self.block = block
        self.dtype = dtype
        # Coarsening policies are stateful across levels (eps decay, grid
        # dims, nullspace propagation) — work on a private copy so the
        # caller's instance stays reusable.
        self.coarsening = copy.deepcopy(
            coarsening or SmoothedAggregation(block_size=block)
        )
        # A block solver's coarsening must aggregate whole block nodes:
        # a user-supplied policy left at the scalar default would split
        # a node's dofs across aggregates (coarse sizes stop being
        # block-divisible; nullspace QR goes rank-deficient).  Inherit
        # the solver's block size unless the user chose one explicitly
        # (reference: amgcl's coarsening templates are instantiated on
        # the backend's value type, so this is implicit there).
        if (
            block > 1
            and getattr(self.coarsening, "block_size", None) == 1
        ):
            if coarsening is not None:
                # The dataclass default (1) is indistinguishable from an
                # explicit user choice of 1; warn so a deliberately scalar
                # coarsening on a block solver is visible, not silent.
                import warnings

                warnings.warn(
                    f"amg: inheriting solver block_size={block} onto the "
                    f"user coarsening (was 1); pass block_size={block} "
                    f"explicitly to silence, or use as_scalar for scalar "
                    f"coarsening on a block solver"
                )
            self.coarsening.block_size = block
        self.relaxation = relaxation or rlx.SPAI0()
        A = sp.csr_matrix(A)
        A.sort_indices()
        self._host_ops = []   # per-level (A, P, R) scipy for rebuild/report
        self.levels = self._build(A)

    # ------------------------------------------------------------------
    def _build(self, A: sp.csr_matrix):
        prm = self.prm
        levels = []
        # coarse_enough semantics: reference default 3000 / block_rows
        # (amgcl/solver/skyline_lu.hpp:92-94 via amg.hpp).
        coarse_enough = prm.coarse_enough

        # With near-nullspace vectors the coarse block size becomes the
        # number of modes, not the fine block size (reference: tentative
        # prolongation produces ncols dofs per aggregate) — store transfer
        # and coarse operators in scalar form then (the role of the
        # reference's as_scalar auto-wrap, coarsening/runtime.hpp:101).
        has_ns = getattr(self.coarsening, "nullspace", None) is not None
        blk = self.block

        while len(levels) < prm.max_levels:
            n = A.shape[0]
            if n <= coarse_enough:
                break
            A_dev = from_scipy_auto(A, block=blk, dtype=self.dtype)
            relax_state = self.relaxation.setup(A, A_dev)
            from ..coarsening.aggregates import EmptyLevelError
            try:
                P, R = self.coarsening.transfer_operators(A)
            except EmptyLevelError:
                # No aggregates could be formed (e.g. a diagonal or
                # fully-decoupled matrix — the reference throws
                # error::empty_level, amgcl/util.hpp:207).  Terminate the
                # hierarchy here; the smoother alone is exact for the
                # decoupled case.
                levels.append(
                    Level(A=A_dev, P=None, R=None, relax=relax_state,
                          coarse_inv=None)
                )
                self._host_ops.append((A, None, None))
                return tuple(levels)
            if P.shape[1] == 0:
                # Nothing left to coarsen — stop here with what we have.
                levels.append(
                    Level(A=A_dev, P=None, R=None, relax=relax_state,
                          coarse_inv=None)
                )
                self._host_ops.append((A, None, None))
                return tuple(levels)
            Ac = self.coarsening.coarse_operator(A, P, R)
            if has_ns:
                blk = 1   # coarse dofs are nullspace modes, not blocks
            if hasattr(self.coarsening, "device_transfer"):
                P_dev = R_dev = self.coarsening.device_transfer(self.dtype)
            else:
                P_dev = from_scipy_auto(P, block=1 if has_ns else blk,
                                        dtype=self.dtype)
                R_dev = from_scipy_auto(R, block=1 if has_ns else blk,
                                        dtype=self.dtype)
            levels.append(
                Level(A=A_dev, P=P_dev, R=R_dev, relax=relax_state,
                      coarse_inv=None)
            )
            self._host_ops.append((A, P, R))
            A = Ac

        # Coarsest level: dense inverse (factorized on host).
        A_dev = from_scipy_auto(A, block=blk, dtype=self.dtype)
        if self.prm.direct_coarse:
            Ad = np.asarray(A.todense())
            inv = np.linalg.inv(Ad)
            levels.append(
                Level(
                    A=A_dev, P=None, R=None, relax=None,
                    coarse_inv=jnp.asarray(inv, dtype=self.dtype),
                )
            )
        else:
            relax_state = self.relaxation.setup(A, A_dev)
            levels.append(
                Level(A=A_dev, P=None, R=None, relax=relax_state,
                      coarse_inv=None)
            )
        self._host_ops.append((A, None, None))
        return tuple(levels)

    # ------------------------------------------------------------------
    def apply(self, r):
        """Preconditioner application: pre_cycles cycles starting from zero
        (reference: amg::apply, amgcl/amg.hpp:289-297)."""
        return amg_apply(self.levels, r, prm=self.prm)

    def system_matrix(self) -> SparseMatrix:
        return self.levels[0].A

    def __call__(self, r):
        return self.apply(r)

    # ------------------------------------------------------------------
    def rebuild(self, A_new: sp.spmatrix):
        """Reuse the existing P/R transfer operators for a matrix with the
        same sparsity but new coefficients (reference: amg::rebuild,
        amgcl/amg.hpp:229-269)."""
        A = sp.csr_matrix(A_new)
        A.sort_indices()
        new_levels = []
        new_hosts = []
        for lvl, (A_old, P, R) in zip(self.levels, self._host_ops):
            A_dev = from_scipy_auto(A, block=self.block, dtype=self.dtype)
            if P is None:
                if lvl.coarse_inv is not None:
                    inv = np.linalg.inv(np.asarray(A.todense()))
                    new_levels.append(
                        dataclasses.replace(
                            lvl, A=A_dev,
                            coarse_inv=jnp.asarray(inv, dtype=self.dtype),
                        )
                    )
                else:
                    relax_state = self.relaxation.setup(A, A_dev)
                    new_levels.append(
                        dataclasses.replace(lvl, A=A_dev, relax=relax_state)
                    )
                new_hosts.append((A, None, None))
                break
            relax_state = self.relaxation.setup(A, A_dev)
            new_levels.append(
                dataclasses.replace(lvl, A=A_dev, relax=relax_state)
            )
            new_hosts.append((A, P, R))
            A = (R @ (A @ P)).tocsr()
        self.levels = tuple(new_levels)
        self._host_ops = new_hosts
        return self

    # ------------------------------------------------------------------
    def __repr__(self):
        from ..utils.report import hierarchy_report
        return hierarchy_report(self)


# ----------------------------------------------------------------------
# Functional cycle (pure; usable under jit with `levels` as an argument)
# ----------------------------------------------------------------------

def _relax_steps(level, rhs, x, steps, post=False):
    """``x=None`` = zero initial guess: the first sweep skips its A @ 0
    SpMV (Pallas SpMVs are opaque custom calls XLA cannot fold)."""
    for _ in range(steps):
        x = (rlx.apply_post if post else rlx.apply_pre)(
            level.relax, level.A, rhs, x
        )
    return x if x is not None else jnp.zeros_like(rhs)


def _cycle(levels, i, rhs, prm: AMGParams):
    lvl = levels[i]
    if i == len(levels) - 1:
        if lvl.coarse_inv is not None:
            return lvl.coarse_inv @ rhs
        x = _relax_steps(lvl, rhs, None, prm.npre)
        x = _relax_steps(lvl, rhs, x, prm.npost, post=True)
        return x

    x = None
    for k in range(prm.ncycle):
        x = _relax_steps(lvl, rhs, x, prm.npre)
        t = rhs - spmv(lvl.A, x)
        rc = _restrict(lvl.R, t)
        xc = _cycle(levels, i + 1, rc, prm)
        # out_len keeps the correction in rhs's (possibly padded) layout
        x = x + _prolong(lvl.P, xc, out_len=rhs.shape[0])
        x = _relax_steps(lvl, rhs, x, prm.npost, post=True)
    return x


def pad_level0_relax(levels, n_al: int):
    """Zero-pad level-0 per-element smoother arrays to the padded-vector
    Krylov length (once per solve call, at the top of the jitted run —
    inside the loop the pad would re-copy every sweep).  Zero padding
    keeps the layout invariant: pad lanes of every vector stay zero."""
    from ..relaxation.spai0 import SPAI0State
    from ..relaxation.damped_jacobi import JacobiState
    from ..relaxation.chebyshev import ChebyshevState

    l0 = levels[0]
    st = l0.relax

    def padv(v):
        return (
            jnp.pad(v, (0, n_al - v.shape[0]))
            if v.ndim == 1 and 1 < v.shape[0] < n_al else v
        )

    if isinstance(st, SPAI0State):
        st = dataclasses.replace(st, m=padv(st.m))
    elif isinstance(st, JacobiState):
        st = dataclasses.replace(st, inv_dia=padv(st.inv_dia))
    elif isinstance(st, ChebyshevState):
        st = dataclasses.replace(st, inv_dia=padv(st.inv_dia))
    else:
        return levels
    return (dataclasses.replace(l0, relax=st),) + tuple(levels[1:])


def amg_cycle(levels, rhs, prm: AMGParams):
    """One multigrid cycle for A x = rhs starting from x = 0 (device
    dtype = hierarchy dtype; caller handles precision coupling)."""
    return _cycle(levels, 0, rhs, prm)


def amg_apply(levels, r, prm: AMGParams):
    """Preconditioner application with mixed-precision coupling: cast to
    the hierarchy dtype, run pre_cycles cycles, cast back."""
    dt = levels[0].A.dtype
    rc = r.astype(dt)
    x = amg_cycle(levels, rc, prm)
    for _ in range(prm.pre_cycles - 1):
        x = x + amg_cycle(levels, rc - spmv(levels[0].A, x), prm)
    return x.astype(r.dtype)


def make_amg_precond(levels, prm: AMGParams):
    return lambda r: amg_apply(levels, r, prm)
