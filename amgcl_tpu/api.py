"""User-facing composition layer.

The analogue of make_solver<Precond, Solver> (reference:
amgcl/make_solver.hpp:45-231): bundle a preconditioner with a Krylov
solver behind one callable.  The complete solve — Krylov loop, multigrid
cycles, coarse direct solve — is one jitted XLA executable; the hierarchy
is passed as a pytree argument so re-solves with a rebuilt hierarchy reuse
the compiled program.

Mixed precision is first-class: `solver_dtype` (default float64) is the
Krylov precision; `precond_dtype` (default float32) is the hierarchy
precision — the coupling of the reference's mixed_precision example.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from .ops.formats import SparseMatrix
from .ops.spmv import spmv
from .precond.amg import AMG, AMGParams, amg_apply
from .precond.as_preconditioner import AsPreconditioner, make_relax_precond
from .precond.dummy import DummyPrecond
from .solver import make_solver_fn
from . import relaxation as rlx
from .coarsening.smoothed_aggregation import SmoothedAggregation


def _padded_layout_len(A_dev, A32_dev, precond):
    """Common padded-vector length for a GridAMG solve, or None when the
    padded layout does not apply (non-DIA operator, unsupported smoother
    state, single level, tiny grids).  All participating operators' tiles
    are powers of two, so the max tile-rounded length is a multiple of
    every tile."""
    from .ops.formats import DiaMatrix
    from .ops.pallas_spmv import dia_padded_len, dia_padded_ok
    from .coarsening.grid_aggregation import GridTransfer
    from .relaxation.spai0 import SPAI0State
    from .relaxation.damped_jacobi import JacobiState
    from .relaxation.chebyshev import ChebyshevState

    lv = precond.levels
    if len(lv) < 2 or not isinstance(lv[0].P, GridTransfer):
        return None
    if not isinstance(
        lv[0].relax, (SPAI0State, JacobiState, ChebyshevState)
    ):
        return None
    mats = [A_dev, A32_dev, lv[0].A, lv[0].P.S, lv[0].P.St]
    mats = [m for m in mats if m is not None]
    if not all(isinstance(m, DiaMatrix) and dia_padded_ok(m) for m in mats):
        return None
    n_al = max(dia_padded_len(m) for m in mats)
    return n_al if n_al > A_dev.shape[0] else None


class Solver:
    """make_solver: P = AMG (or any precond object), S = a Krylov solver.

    call as solver(rhs) or solver(rhs, x0) -> (x, SolveInfo).
    """

    def __init__(
        self,
        A,
        solver: str = "cg",
        precond: str | object = "amg",
        *,
        block: int = 1,
        solver_dtype=jnp.float64,
        precond_dtype=jnp.float32,
        coarsening=None,
        relaxation=None,
        amg_params: AMGParams | None = None,
        matrix_format: str = "auto",
        **solver_params,
    ):
        from .ops.formats import DiaMatrix, from_scipy_auto

        self._matrix_format = matrix_format

        if isinstance(A, DiaMatrix):
            # Device-resident input (e.g. assembled on-device with
            # models.poisson.poisson3d_dia): zero host work, zero upload.
            # Requires the device-side grid setup (GridAMG) or an
            # already-built preconditioner object.
            self.A_host = None
            self.block = block
            self.solver_params = solver_params
            self.solver_name = solver
            self._solver_fn = make_solver_fn(solver)
            self.A_dev = A.astype(solver_dtype)
            self.A32_dev = None   # DIA astype keeps the fast kernel
            # Options meaningless on the device-matrix path are rejected
            # rather than silently ignored.
            if solver_params.pop("device_setup", True) is False:
                raise ValueError(
                    "device_setup=False is meaningless for device-resident "
                    "(DiaMatrix) input — setup is always on device"
                )
            if matrix_format != "auto":
                raise ValueError(
                    "matrix_format is fixed by device-resident input; "
                    f"got {matrix_format!r}"
                )
            if isinstance(precond, str):
                if precond == "amg":
                    from .coarsening.grid_aggregation import GridAggregation
                    from .precond.grid_setup import GridAMG

                    if not isinstance(coarsening, GridAggregation):
                        raise ValueError(
                            "device (DiaMatrix) input requires "
                            "GridAggregation coarsening or a prebuilt "
                            "preconditioner object"
                        )
                    self.precond = GridAMG(
                        A.astype(precond_dtype), coarsening.dims,
                        relaxation=relaxation, params=amg_params,
                        dtype=precond_dtype,
                        eps_strong=coarsening.eps_strong,
                        relax_factor=coarsening.relax,
                    )
                elif precond == "dummy":
                    self.precond = DummyPrecond(A, dtype=precond_dtype)
                else:
                    raise ValueError(
                        f"device input supports precond='amg'/'dummy' or a "
                        f"prebuilt object; got {precond!r}"
                    )
            else:
                self.precond = precond
            self._compiled = self._make_jitted()
            return

        if hasattr(A, "tocsr") and not sp.issparse(A):
            A = A.tocsr()   # e.g. adapter.CrsBuilder (assemble on demand)
        A = sp.csr_matrix(A)
        A.sort_indices()
        self.A_host = A
        self.block = block
        self.solver_params = solver_params
        self.solver_name = solver
        self._solver_fn = make_solver_fn(solver)

        # Outer operator in solver precision (true residuals at 1e-8 need
        # f64; the hierarchy below stays in f32).
        self.A_dev = from_scipy_auto(A, block=block, dtype=solver_dtype,
                                     format=matrix_format)
        # refine's inner f32 solve gets its own format selection: an
        # astype() of the f64 outer format inherits that format's layout,
        # and the fast unstructured kernels (SELL) are f32-only — invisible
        # to the f64 pick.  Without this the inner Krylov A·p rides the
        # serialized-gather path on TPU.
        self.A32_dev = None
        if solver == "refine" and jnp.dtype(solver_dtype) == jnp.float64:
            from .ops.formats import BlockDiaMatrix

            A32 = self.A_dev.astype(jnp.float32)
            if block > 1 or (type(A32) is type(self.A_dev)
                             and not isinstance(
                                 self.A_dev, (DiaMatrix, BlockDiaMatrix)
                             )):
                # astype stayed in the f64 pick's (possibly gather-slow)
                # layout; rerun selection in f32, which may find an
                # f32-only kernel format (DIA astype is already fast)
                A32 = from_scipy_auto(A, block=block, dtype=jnp.float32,
                                      format=matrix_format)
            if type(A32) is not type(self.A_dev):
                self.A32_dev = A32

        device_setup = solver_params.pop("device_setup", False)
        if isinstance(precond, str):
            if precond == "amg" and device_setup:
                from .coarsening.grid_aggregation import GridAggregation
                from .coarsening.smoothed_aggregation import (
                    SmoothedAggregation,
                )
                from .precond.grid_setup import GridAMG
                from .precond.ell_setup import DeviceGeneralAMG

                if isinstance(coarsening, GridAggregation):
                    self.precond = GridAMG(
                        A,
                        coarsening.dims,
                        relaxation=relaxation,
                        params=amg_params,
                        dtype=precond_dtype,
                        eps_strong=coarsening.eps_strong,
                        relax_factor=coarsening.relax,
                    )
                elif coarsening is None or isinstance(
                    coarsening, SmoothedAggregation
                ):
                    # general (unstructured) on-device setup: PMIS
                    # aggregation + sort-based Galerkin RAP; block
                    # matrices aggregate block-aligned on the condensed
                    # Frobenius graph.  The finest-level operator for
                    # the solve phase reuses the auto-selected fast
                    # format (BlockDia/BlockSell) instead of the setup's
                    # scalar ELL expansion.
                    eps = (
                        coarsening.eps_strong if coarsening is not None
                        else 0.08
                    )
                    rfac = (
                        coarsening.relax if coarsening is not None else 1.0
                    )
                    lvl0 = None
                    if block > 1:
                        lvl0 = from_scipy_auto(
                            A, block=block, dtype=precond_dtype,
                            format=matrix_format,
                        )
                    self.precond = DeviceGeneralAMG(
                        A,
                        relaxation=relaxation,
                        params=amg_params,
                        dtype=precond_dtype,
                        eps_strong=eps,
                        relax_factor=rfac,
                        block=block,
                        level0_A=lvl0,
                    )
                else:
                    raise ValueError(
                        "device_setup supports GridAggregation or "
                        "smoothed aggregation"
                    )
            elif precond == "amg":
                self.precond = AMG(
                    A,
                    coarsening=coarsening,
                    relaxation=relaxation,
                    params=amg_params,
                    block=block,
                    dtype=precond_dtype,
                )
            elif precond == "relaxation":
                self.precond = AsPreconditioner(
                    A,
                    relaxation=relaxation,
                    block=block,
                    dtype=precond_dtype,
                )
            elif precond == "dummy":
                self.precond = DummyPrecond(A, block=block, dtype=precond_dtype)
            else:
                raise ValueError(f"unknown preconditioner class {precond!r}")
        else:
            self.precond = precond

        self._compiled = self._make_jitted()

    # ------------------------------------------------------------------
    def _make_jitted(self):
        from .precond.grid_setup import GridAMG
        from .precond.ell_setup import DeviceGeneralAMG

        solver_fn = self._solver_fn
        params = dict(self.solver_params)

        A32_dev = getattr(self, "A32_dev", None)
        try:
            on_tpu = jax.default_backend() != "cpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            from .ops.pallas_spmv import prepad_pallas
        else:
            prepad_pallas = lambda o, pad_to=None: o

        if isinstance(self.precond, (AMG, GridAMG, DeviceGeneralAMG)):
            prm = self.precond.prm

            # Padded-vector Krylov layout (grid/DIA path): keep every
            # solve-loop vector at the common tile-aligned length so the
            # level-0 SpMVs run the zero-copy padded kernel — no per-SpMV
            # pad/unpad (measured 0.39 -> 0.33 ms per 150³ L0 SpMV).
            pad_n_al = (
                _padded_layout_len(self.A_dev, A32_dev, self.precond)
                if isinstance(self.precond, GridAMG) else None
            )

            @partial(jax.jit, static_argnames=())
            def run(A_dev, A32, levels, rhs, x0):
                # hoist the Pallas data pads out of the Krylov loop
                # (XLA has no while-loop LICM; see prepad_pallas)
                A_dev = prepad_pallas(A_dev, pad_n_al)
                A32 = prepad_pallas(A32, pad_n_al)
                levels = prepad_pallas(levels, pad_n_al)
                n = rhs.shape[0]
                if pad_n_al:
                    from .precond.amg import pad_level0_relax

                    levels = pad_level0_relax(levels, pad_n_al)
                    rhs = jnp.pad(rhs, (0, pad_n_al - n))
                    x0 = jnp.pad(x0, (0, pad_n_al - n))
                P = lambda r: amg_apply(levels, r, prm)
                extra = {} if A32 is None else {"A32": A32}
                x, info = solver_fn(A_dev, P, rhs, x0, **extra, **params)
                if pad_n_al:
                    x = jax.lax.slice(x, (0,), (n,))
                return x, info

            return lambda rhs, x0: run(
                self.A_dev, A32_dev, self.precond.levels, rhs, x0
            )

        if isinstance(self.precond, AsPreconditioner):

            @jax.jit
            def run(A_dev, A32, state, P_A, rhs, x0):
                P = make_relax_precond(state, P_A)
                extra = {} if A32 is None else {"A32": A32}
                return solver_fn(A_dev, P, rhs, x0, **extra, **params)

            return lambda rhs, x0: run(
                self.A_dev, A32_dev, self.precond.state,
                self.precond.A_dev, rhs, x0
            )

        if isinstance(self.precond, DummyPrecond):

            @jax.jit
            def run(A_dev, A32, rhs, x0):
                extra = {} if A32 is None else {"A32": A32}
                return solver_fn(A_dev, None, rhs, x0, **extra, **params)

            return lambda rhs, x0: run(self.A_dev, A32_dev, rhs, x0)

        # Generic object with .apply — cannot pass state as pytree; jit with
        # the precondition closed over (compiled once per Solver).
        P = self.precond

        @jax.jit
        def run(A_dev, A32, rhs, x0):
            extra = {} if A32 is None else {"A32": A32}
            return solver_fn(A_dev, P.apply, rhs, x0, **extra, **params)

        return lambda rhs, x0: run(self.A_dev, A32_dev, rhs, x0)

    # ------------------------------------------------------------------
    def __call__(self, rhs, x0=None):
        dt = self.A_dev.dtype
        rhs = jnp.asarray(rhs, dtype=dt)
        if rhs.shape != (self.A_dev.shape[0],):
            raise ValueError(
                f"rhs has shape {rhs.shape}, expected ({self.A_dev.shape[0]},)"
            )
        x0 = jnp.zeros_like(rhs) if x0 is None else jnp.asarray(x0, dtype=dt)
        return self._compiled(rhs, x0)

    def rebuild(self, A_new):
        """Re-solve with new coefficients on the same sparsity: rebuild the
        hierarchy reusing P/R (reference: make_solver::operator()(A,rhs,x),
        amgcl/make_solver.hpp:116-135)."""
        from .ops.formats import DiaMatrix, from_scipy_auto
        from .precond.grid_setup import GridAMG

        if isinstance(A_new, DiaMatrix):
            if not isinstance(self.precond, GridAMG):
                raise NotImplementedError(
                    "device-matrix rebuild needs the GridAMG preconditioner"
                )
            self.precond.rebuild(A_new)
            self.A_dev = A_new.astype(self.A_dev.dtype)
            return self
        if not isinstance(self.precond, (AMG, GridAMG)):
            raise NotImplementedError(
                "rebuild is supported for the AMG preconditioners"
            )
        A = sp.csr_matrix(A_new)
        self.precond.rebuild(A)
        self.A_dev = from_scipy_auto(
            A, block=self.block, dtype=self.A_dev.dtype,
            format=self._matrix_format,
        )
        if getattr(self, "A32_dev", None) is not None:
            self.A32_dev = from_scipy_auto(
                A, block=self.block, dtype=jnp.float32,
                format=self._matrix_format,
            )
            self._compiled = self._make_jitted()
        return self

    def __repr__(self):
        inner = repr(self.precond) if isinstance(self.precond, AMG) else type(
            self.precond
        ).__name__
        return f"Solver({self.solver_name})\n{inner}"


def make_solver(A, solver="cg", precond="amg", **kw) -> Solver:
    return Solver(A, solver=solver, precond=precond, **kw)


def make_block_solver(A, block: int, solver="cg", precond="amg", **kw) -> Solver:
    """Solve a scalar-input system with block value types (the reference's
    make_block_solver, amgcl/make_block_solver.hpp:20: convert scalar input
    to blocks, solve, reinterpret vectors — vector reinterpretation is a
    no-op in our flat layout)."""
    return Solver(A, solver=solver, precond=precond, block=block, **kw)
