"""Distributed make_solver — the mirror of mpi::make_solver
(amgcl/mpi/make_solver.hpp:56-200).

Composition: any Krylov solver from the serial suite (unchanged code)
with (1) the operator = distributed SpMV over the mesh axis, (2) the
inner product = psum reduction, and (3) a distributed preconditioner:

* ``precond="coupled_amg"`` — the true distributed hierarchy
  (mpi::amg role): grid-aligned slab levels when ``dims`` is given,
  the general row-sharded halo-ELL hierarchy otherwise; iteration
  counts match the serial solver exactly;
* ``precond="amg"`` — per-shard local AMG on the diagonal blocks, the
  additive-Schwarz composition of mpi::block_preconditioner
  (amgcl/mpi/block_preconditioner.hpp:48-99); local hierarchies are
  stacked leaf-wise and must be structurally identical (equal slabs,
  grid-aligned coarsening), which the builder checks;
* ``precond="relaxation"`` — per-shard smoothers (the MPI relaxation
  wrappers' role);
* ``precond="cpr"`` / ``"schur"`` — the distributed coupled
  preconditioners (mpi::cpr / mpi::schur_pressure_correction roles);
* ``deflation=True`` adds two-level subdomain deflation
  (mpi::subdomain_deflation role);
* ``solver="refine"`` runs the mixed-precision defect-correction
  driver against an f32 copy of the distributed operator.

The whole distributed solve is one shard_map'd jitted program; vectors
are globally sharded arrays, so multi-chip scaling is pure data layout.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..ops import blas1
from ..precond.amg import AMG, AMGParams, amg_apply
from ..solver import make_solver_fn
from .. import relaxation as rlx
from .partition import make_dist_matrix, pad_to_multiple
from .dist import dist_spmv


def _stack_trees(trees):
    """Stack identical-structure pytrees along a new leading axis."""
    import jax.tree_util as jtu

    treedefs = {jtu.tree_structure(t) for t in trees}
    if len(treedefs) != 1:
        raise ValueError(
            "per-shard hierarchies differ structurally; use grid-aligned "
            "coarsening (equal slabs) or a relaxation preconditioner"
        )
    return jtu.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


class DistSolver:
    """Distributed solver over a 1D device mesh.

    dims: optional logical grid dims of the problem (enables grid-aligned
    local AMG so all shards coarsen identically)."""

    def __init__(
        self,
        A,
        solver: str = "cg",
        *,
        mesh: Mesh | None = None,
        n_shards: int | None = None,
        dims: tuple | None = None,
        precond: str = "amg",
        coarsening=None,
        relaxation=None,
        amg_params: AMGParams | None = None,
        solver_dtype=jnp.float64,
        precond_dtype=jnp.float32,
        axis: str = "shard",
        block: int = 1,
        deflation: bool = False,
        cpr_block_size: int = 0,
        pprecond: dict | None = None,
        pmask=None,
        schur_params: dict | None = None,
        **solver_params,
    ):
        if mesh is None:
            devs = np.array(jax.devices()[: (n_shards or len(jax.devices()))])
            mesh = Mesh(devs, (axis,))
        self.mesh = mesh
        self.axis = axis
        S = mesh.shape[axis]
        self.S = S

        from ..ops.formats import DiaMatrix
        from .dist import DistDia

        self._n2o = None
        if isinstance(A, DiaMatrix):
            # Device-resident input (e.g. assembled on-chip): the slab
            # partition of DIA data is a pure reshape, so the whole
            # distributed setup never touches the host.  Grid coupled
            # hierarchy only (it is the device-setup path).
            if precond != "coupled_amg" or dims is None or deflation:
                raise ValueError(
                    "device (DiaMatrix) input supports "
                    "precond='coupled_amg' with grid dims (no deflation)"
                )
            n = A.shape[0]
            if n % S:
                raise ValueError(
                    f"device input size {n} must divide the shard count {S}"
                )
            self.n = self.n_true = n
            n_loc = n // S
            H = max(max(A.offsets), -min(A.offsets), 0)
            if H > n_loc:
                raise ValueError(
                    f"halo width {H} exceeds shard size {n_loc}"
                )
            from .dist_amg import _shard_dia_data, build_dist_grid_amg

            A_solver = A.astype(solver_dtype)
            offsets = A.offsets
            self.arrs = (_shard_dia_data(A_solver, S),)

            def make_local(arrs):
                (d,) = arrs
                return DistDia(data=d, offsets=offsets, n=n, n_loc=n_loc,
                               axis=axis)

            self.make_local = make_local
            if solver == "refine":
                self.arrs32 = (_shard_dia_data(A.astype(jnp.float32), S),)
                self.make_local32 = make_local
            else:
                self.arrs32 = ()

            dlv, tail, self.local_prm = build_dist_grid_amg(
                A.astype(precond_dtype), dims, S, axis=axis,
                relaxation=relaxation, params=amg_params,
                dtype=precond_dtype,
            )
            self.levels_stacked = (dlv, tail)
            self._precond_kind = "coupled_amg"
            self._finalize(solver, deflation, solver_params, mesh, axis,
                           solver_dtype)
            return

        A = sp.csr_matrix(A)
        if precond == "schur":
            # Distributed Schur pressure correction (mpi::schur role):
            # permute so each shard's slab is [its u rows | its p rows],
            # making the split a static local slice.
            from .dist_coupled import build_dist_schur

            if pmask is None:
                raise ValueError("precond='schur' requires pmask")
            n_orig = A.shape[0]
            sharded, replicated, schur_meta, new2old = build_dist_schur(
                A, pmask, S, axis=axis, dtype=precond_dtype,
                **(schur_params or {}),
            )
            nv = int((new2old < 0).sum())
            A_ext = (
                sp.block_diag([A, sp.eye(nv)], format="csr") if nv else A
            )
            idx = new2old.copy()
            idx[idx < 0] = n_orig + np.arange(nv)
            A = sp.csr_matrix(A_ext[idx][:, idx])
            A.sort_indices()
            self._n2o = new2old
            self.levels_stacked = (sharded, replicated)
            self._schur_meta = schur_meta
            self._precond_kind = "schur"
        pad_unit = S * cpr_block_size if precond == "cpr" else S * block
        A, _, self.n_true = pad_to_multiple(A, None, pad_unit)
        n = A.shape[0]
        self.n = n
        n_loc = n // S
        self.block = block

        # Block systems shard in block formats (DistBlockDia / block
        # DistEllH) — the distributed counterpart of the reference's
        # static_matrix block paths (amgcl/mpi/relaxation/spai0.hpp etc.).
        self.arrs, self.make_local = make_dist_matrix(
            A, S, axis=axis, block=block, dtype=solver_dtype
        )
        # Mixed-precision refine: the inner Krylov runs against an f32
        # copy of the distributed operator (same halo machinery).
        if solver == "refine":
            self.arrs32, self.make_local32 = make_dist_matrix(
                A, S, axis=axis, block=block, dtype=jnp.float32
            )
        else:
            self.arrs32 = ()

        # Per-shard local preconditioner on the diagonal blocks.
        if precond == "coupled_amg":
            # True distributed hierarchy (mpi::amg role): grid-aligned
            # slab levels when dims are known, the general row-sharded
            # hierarchy otherwise.
            if dims is not None:
                from .dist_amg import build_dist_grid_amg

                dlv, tail, local_prm = build_dist_grid_amg(
                    A, dims, S, axis=axis, relaxation=relaxation,
                    params=amg_params, dtype=precond_dtype,
                )
                self._precond_kind = "coupled_amg"
            else:
                from .dist_general import build_dist_general_amg

                dlv, tail, local_prm = build_dist_general_amg(
                    A, S, axis=axis, coarsening=coarsening,
                    relaxation=relaxation, params=amg_params,
                    dtype=precond_dtype,
                )
                self._precond_kind = "coupled_general"
            self.local_prm = local_prm
            self.levels_stacked = (dlv, tail)
        elif precond == "amg":
            from ..utils.profiler import Profiler

            locals_ = []
            self.shard_profilers = []
            for s in range(S):
                shard_prof = Profiler(f"shard{s}")
                self.shard_profilers.append(shard_prof)
                blk = sp.csr_matrix(
                    A[s * n_loc : (s + 1) * n_loc, s * n_loc : (s + 1) * n_loc]
                )
                coarsening = None
                if dims is not None:
                    from ..coarsening.grid_aggregation import GridAggregation

                    d0 = dims[0]
                    if (d0 % S) or (np.prod(dims[1:], initial=1) * (d0 // S)) != n_loc:
                        raise ValueError(
                            "grid dims must split evenly over shards"
                        )
                    coarsening = GridAggregation(
                        dims=(d0 // S,) + tuple(dims[1:])
                    )
                with shard_prof.scope("local setup"):
                    locals_.append(
                        AMG(
                            blk,
                            coarsening=coarsening,
                            relaxation=relaxation,
                            params=amg_params,
                            block=block,
                            dtype=precond_dtype,
                        )
                    )
            self.local_prm = locals_[0].prm
            self.levels_stacked = _stack_trees([a.levels for a in locals_])
            self._precond_kind = "amg"
        elif precond == "cpr":
            # Distributed CPR (mpi::cpr role): distributed pressure AMG +
            # sharded global smoother, reshape-local transfers.
            from .dist_coupled import build_dist_cpr

            if not cpr_block_size:
                raise ValueError("precond='cpr' requires cpr_block_size")
            sharded, replicated, cpr_meta, K_meta = build_dist_cpr(
                A, S, block_size=cpr_block_size, axis=axis,
                relaxation=relaxation, pprecond=pprecond,
                dtype=precond_dtype,
            )
            self.levels_stacked = (sharded, replicated)
            self._cpr_meta = (cpr_meta, K_meta)
            self._precond_kind = "cpr"
        elif precond == "relaxation":
            relaxation = relaxation or rlx.SPAI0()
            from ..ops.formats import SparseMatrix
            import dataclasses as _dc

            blocks = [
                sp.csr_matrix(
                    A[s * n_loc : (s + 1) * n_loc, s * n_loc : (s + 1) * n_loc]
                )
                for s in range(S)
            ]
            # Uniform ELL width across shards so states stack structurally.
            mats = [
                SparseMatrix.from_scipy(b, block=block, dtype=precond_dtype)
                for b in blocks
            ]
            K = max(m.width for m in mats)
            mats = [
                _dc.replace(
                    m,
                    data=jnp.pad(
                        m.data, ((0, K - m.width), (0, 0), (0, 0), (0, 0))
                    ),
                    cols=jnp.pad(m.cols, ((0, K - m.width), (0, 0))),
                    nnz=-1,   # canonical meta so shard pytrees stack
                )
                for m in mats
            ]
            from ..utils.profiler import Profiler

            self.shard_profilers = []
            states = []
            for s, (b, m) in enumerate(zip(blocks, mats)):
                pr = Profiler(f"shard{s}")
                self.shard_profilers.append(pr)
                with pr.scope("local setup"):
                    states.append(relaxation.setup(b, m))
            self.levels_stacked = _stack_trees(
                [(s_, m) for s_, m in zip(states, mats)]
            )
            self._precond_kind = "relaxation"
        elif precond == "schur":
            pass   # built above (needed the pre-padding matrix)
        elif precond == "dummy":
            self.levels_stacked = None
            self._precond_kind = "dummy"
        else:
            raise ValueError(f"unknown distributed preconditioner {precond!r}")

        self._finalize(solver, deflation, solver_params, mesh, axis,
                       solver_dtype, A_host=A)

    # ------------------------------------------------------------------
    def _finalize(self, solver, deflation, solver_params, mesh, axis,
                  solver_dtype, A_host=None):
        """Deflation setup + the jitted shard_map solve program (shared
        by the host-CSR and device-resident construction paths)."""
        S = self.S
        n_loc = self.n // S
        # Two-level subdomain deflation (mpi::subdomain_deflation parity):
        # projected operator + tiny replicated coarse solve.
        self.deflation = deflation
        if deflation:
            from .deflation import make_deflation_ops

            if A_host is None:
                raise ValueError("deflation requires a host matrix")
            self.AZ, self.Einv = make_deflation_ops(
                A_host, S, axis, solver_dtype
            )
        else:
            self.AZ = jnp.zeros((S, n_loc, 1), dtype=solver_dtype)
            self.Einv = jnp.zeros((1, 1), dtype=solver_dtype)

        self.solver_name = solver
        solver_fn = make_solver_fn(solver)
        solver_params.setdefault("tol", 1e-8)
        inner = blas1.make_psum_inner_product(axis)
        make_local = self.make_local
        kind = self._precond_kind
        local_prm = getattr(self, "local_prm", None)
        cpr_meta_static = getattr(self, "_cpr_meta", None)
        schur_meta_static = getattr(self, "_schur_meta", None)
        use_defl = deflation

        make_local32 = getattr(self, "make_local32", None)
        is_refine = solver == "refine"

        def shard_solve(arrs, arrs32, levels, AZ, Einv, rhs_loc, x0_loc):
            arrs = tuple(a[0] for a in arrs)
            A_local = make_local(arrs)
            Aop = lambda v: dist_spmv(A_local, v)
            extra = {}
            if is_refine:
                A32_local = make_local32(tuple(a[0] for a in arrs32))
                extra["A32"] = lambda v: dist_spmv(A32_local, v)
            if kind == "coupled_amg":
                from .dist_amg import dist_amg_apply

                dlv, tail = levels
                Pop = lambda r: dist_amg_apply(dlv, tail, r, local_prm, axis)
            elif kind == "coupled_general":
                from .dist_general import dist_general_apply

                dlv, tail = levels
                Pop = lambda r: dist_general_apply(
                    dlv, tail, r, local_prm, axis
                )
            elif kind == "cpr":
                from .dist_coupled import dist_cpr_apply

                sharded, replicated = levels
                cpr_meta, K_meta = cpr_meta_static
                Pop = lambda r: dist_cpr_apply(
                    sharded, replicated, cpr_meta, K_meta, r, axis
                )
            elif kind == "schur":
                from .dist_coupled import dist_schur_apply

                sharded, replicated = levels
                Pop = lambda r: dist_schur_apply(
                    sharded, replicated, schur_meta_static, inner, r, axis
                )
            elif kind == "amg":
                lv = _unstack_tree(levels)
                Pop = lambda r: amg_apply(lv, r, local_prm)
            elif kind == "relaxation":
                state, blk = _unstack_tree(levels)
                from ..precond.as_preconditioner import make_relax_precond

                Pop = make_relax_precond(state, blk)
            else:
                Pop = None

            if not use_defl:
                return solver_fn(
                    Aop, Pop, rhs_loc, x0_loc,
                    inner_product=inner, **solver_params, **extra,
                )

            from .deflation import make_project

            AZ_loc = AZ[0]                       # (n_loc, S)
            nparts = Einv.shape[0]
            proj = make_project(AZ_loc, Einv, axis)
            my = jax.lax.axis_index(axis)

            def zt(v):
                return jax.lax.psum(
                    (jnp.arange(nparts) == my) * jnp.sum(v), axis
                )

            A_defl = lambda v: proj(Aop(v))
            if is_refine:
                A32_base = extra["A32"]
                # proj's deflation factors live in solver precision; keep
                # the inner solve's dtype stable across the projection.
                extra["A32"] = (
                    lambda v: proj(A32_base(v)).astype(v.dtype)
                )
            xt, info = solver_fn(
                A_defl, Pop, proj(rhs_loc), x0_loc,
                inner_product=inner, **solver_params, **extra,
            )
            # x = Q b + Pᵀ x̃
            qb = (Einv @ zt(rhs_loc))[my] * jnp.ones_like(rhs_loc)
            w = jax.lax.psum(AZ_loc.T @ xt, axis)
            x = qb + xt - (Einv.T @ w)[my] * jnp.ones_like(xt)
            return x, info

        if kind in ("coupled_amg", "coupled_general", "cpr", "schur"):
            dlv, tail = self.levels_stacked
            levels_spec = (
                jax.tree_util.tree_map(lambda _: P(axis), dlv),
                jax.tree_util.tree_map(lambda _: P(), tail),
            )
        else:
            levels_spec = jax.tree_util.tree_map(
                lambda _: P(axis), self.levels_stacked
            )
        in_specs = (
            tuple(P(axis) for _ in self.arrs),
            tuple(P(axis) for _ in self.arrs32),
            levels_spec,
            P(axis),
            P(),
            P(axis),
            P(axis),
        )
        self._solve = jax.jit(
            jax.shard_map(
                shard_solve,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(axis), P()),
                check_vma=False,
            )
        )

    def _to_internal(self, v, dt):
        """Original-ordering vector → padded (and Schur-permuted) layout."""
        v = np.asarray(v, dtype=dt)
        if self._n2o is not None:
            vp = np.zeros(len(self._n2o), dtype=dt)
            valid = self._n2o >= 0
            vp[valid] = v[self._n2o[valid]]
            v = vp
        pad = self.n - len(v)
        if pad:
            v = np.concatenate([v, np.zeros(pad, dtype=dt)])
        return v

    def __call__(self, rhs, x0=None):
        dt = self.arrs[0].dtype
        rhs = self._to_internal(rhs, dt)
        sh = NamedSharding(self.mesh, P(self.axis))
        rhs_d = jax.device_put(jnp.asarray(rhs), sh)
        x0_d = (
            jax.device_put(jnp.zeros_like(rhs_d), sh)
            if x0 is None
            else jax.device_put(
                jnp.asarray(self._to_internal(x0, dt)), sh
            )
        )
        x, info = self._solve(
            self.arrs, self.arrs32, self.levels_stacked, self.AZ, self.Einv,
            rhs_d, x0_d
        )
        if self._n2o is not None:
            xh = np.asarray(x)
            valid = self._n2o >= 0
            xo = np.empty(int(valid.sum()), dtype=xh.dtype)
            xo[self._n2o[valid]] = xh[: len(self._n2o)][valid]
            return xo, info
        return x[: self.n_true], info
