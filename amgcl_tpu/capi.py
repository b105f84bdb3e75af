"""Python side of the C ABI bindings (reference: lib/amgcl.cpp).

The C shared library (lib/amgcl_tpu_c.cpp) embeds the Python runtime and
calls these functions, passing raw buffer *addresses*; marshaling happens
here with ctypes/numpy zero-copy views — the same zero-copy contract as
the reference's amgcl_solver_create(ptr, col, val) C API
(lib/amgcl.h:44-100).
"""

from __future__ import annotations

import ctypes
import json

import numpy as np
import scipy.sparse as sp

_handles: dict[int, object] = {}
_next_id = [1]


def _view(addr: int, n: int, ctype):
    return np.ctypeslib.as_array((ctype * n).from_address(addr))


def create(n: int, ptr_addr: int, col_addr: int, val_addr: int,
           params_json: str) -> int:
    """Build a solver from raw CSR buffers; returns an integer handle."""
    indptr = _view(ptr_addr, n + 1, ctypes.c_int64).copy()
    nnz = int(indptr[-1])
    indices = _view(col_addr, nnz, ctypes.c_int64).copy()
    data = _view(val_addr, nnz, ctypes.c_double).copy()
    A = sp.csr_matrix(
        (data, indices.astype(np.int64), indptr), shape=(n, n)
    )

    from .runtime import make_solver_from_config

    config = json.loads(params_json) if params_json else {}
    S = make_solver_from_config(A, config)
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = S
    return h


def solve(handle: int, rhs_addr: int, x_addr: int, n: int) -> tuple:
    """Solve with rhs from rhs_addr; writes the solution into x_addr.
    Returns (iters, error)."""
    S = _handles[handle]
    rhs = _view(rhs_addr, n, ctypes.c_double).copy()
    x_out = _view(x_addr, n, ctypes.c_double)
    x0 = x_out.copy()
    x, info = S(rhs, x0)
    x_out[:] = np.asarray(x, dtype=np.float64)
    return int(info.iters), float(info.error)


def destroy(handle: int) -> None:
    _handles.pop(handle, None)


def create_dist(n: int, ptr_addr: int, col_addr: int, val_addr: int,
                n_shards: int, params_json: str) -> int:
    """Distributed-solver constructor — the role of the reference's MPI C
    binding amgcl_mpi_create (lib/amgcl_mpi.h:44-64), with the device mesh
    standing in for the MPI communicator.  Config keys: solver.type/tol/
    maxiter, precond.type ∈ {amg, coupled_amg, relaxation, dummy, cpr,
    schur}, plus deflation: true for subdomain deflation."""
    indptr = _view(ptr_addr, n + 1, ctypes.c_int64).copy()
    nnz = int(indptr[-1])
    indices = _view(col_addr, nnz, ctypes.c_int64).copy()
    data = _view(val_addr, nnz, ctypes.c_double).copy()
    A = sp.csr_matrix((data, indices.astype(np.int64), indptr), shape=(n, n))

    from .parallel.dist_solver import DistSolver
    from .coarsening import make_coarsening
    from .relaxation import make_smoother
    from .precond.amg import AMGParams

    config = json.loads(params_json) if params_json else {}
    sol = dict(config.get("solver", {}))
    prec = dict(config.get("precond", {}))
    kw = dict(
        solver=sol.pop("type", "cg"),
        precond=prec.pop("type", "amg"),
        n_shards=(n_shards or None),
        deflation=bool(config.get("deflation", False)),
        **sol,
    )
    if "cpr_block_size" in prec:
        kw["cpr_block_size"] = int(prec.pop("cpr_block_size"))
    if "dims" in prec:
        kw["dims"] = tuple(int(d) for d in prec.pop("dims"))
    if "coarsening" in prec:
        cprm = dict(prec.pop("coarsening"))
        kw["coarsening"] = make_coarsening(
            cprm.pop("type", "smoothed_aggregation"), **cprm
        )
    if "relax" in prec:
        rprm = dict(prec.pop("relax"))
        kw["relaxation"] = make_smoother(rprm.pop("type", "spai0"), **rprm)
    amg_keys = {k: prec.pop(k) for k in list(prec)
                if k in {"coarse_enough", "direct_coarse", "max_levels",
                         "npre", "npost", "ncycle", "pre_cycles"}}
    if amg_keys:
        kw["amg_params"] = AMGParams(**amg_keys)
    if prec:
        raise ValueError(
            f"unsupported distributed precond parameter(s): {sorted(prec)}"
        )
    S = DistSolver(A, **kw)
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = S
    return h
