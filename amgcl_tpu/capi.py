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


# ----------------------------------------------------------------------
# Parameter handles (reference: amgcl_params_create/seti/setf/sets/
# read_json/destroy, lib/amgcl.h:46-63) — a dict addressed with the same
# dotted paths as the property tree.
# ----------------------------------------------------------------------

def params_create() -> int:
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = {"__params__": {}}
    return h


def _params_set(handle: int, name: str, value) -> None:
    from .runtime import expand_dotted

    d = _handles[handle]["__params__"]
    for k, v in expand_dotted({name: value}).items():
        if isinstance(v, dict) and isinstance(d.get(k), dict):
            _deep_update(d[k], v)
        else:
            d[k] = v


def _deep_update(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def params_seti(handle: int, name: str, value: int) -> None:
    _params_set(handle, name, int(value))


def params_setf(handle: int, name: str, value: float) -> None:
    _params_set(handle, name, float(value))


def params_sets(handle: int, name: str, value: str) -> None:
    try:
        value = json.loads(value)
    except json.JSONDecodeError:
        pass
    _params_set(handle, name, value)


def params_read_json(handle: int, fname: str) -> None:
    with open(fname) as f:
        _deep_update(_handles[handle]["__params__"], json.load(f))


def _params_json_of(params_handle: int) -> str:
    if params_handle and params_handle in _handles:
        return json.dumps(_handles[params_handle]["__params__"])
    return ""


def create_p(n, ptr_addr, col_addr, val_addr, params_handle: int) -> int:
    """Solver create with a params *handle* (amgcl_solver_create parity)."""
    return create(n, ptr_addr, col_addr, val_addr,
                  _params_json_of(params_handle))


def _csr_from_f(n, ptr_addr, col_addr, val_addr):
    """1-based (Fortran) CSR arrays → scipy (amgcl_*_create_f parity)."""
    indptr = _view(ptr_addr, n + 1, ctypes.c_int64).copy() - 1
    nnz = int(indptr[-1])
    indices = _view(col_addr, nnz, ctypes.c_int64).copy() - 1
    data = _view(val_addr, nnz, ctypes.c_double).copy()
    return sp.csr_matrix(
        (data, indices.astype(np.int64), indptr), shape=(n, n)
    )


def create_f(n, ptr_addr, col_addr, val_addr, params_handle: int) -> int:
    """Fortran-indexed solver create (reference amgcl_solver_create_f)."""
    from .runtime import make_solver_from_config

    A = _csr_from_f(n, ptr_addr, col_addr, val_addr)
    config = json.loads(_params_json_of(params_handle) or "{}")
    S = make_solver_from_config(A, config)
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = S
    return h


# ----------------------------------------------------------------------
# Preconditioner-only handles (reference: amgcl_precond_create/apply/
# report/destroy, lib/amgcl.h:64-90)
# ----------------------------------------------------------------------

def _precond_from_config(A, config):
    from .runtime import make_solver_from_config

    cfg = dict(config or {})
    cfg["solver"] = {"type": "preonly"}
    return make_solver_from_config(A, cfg)


def precond_create(n, ptr_addr, col_addr, val_addr,
                   params_handle: int) -> int:
    indptr = _view(ptr_addr, n + 1, ctypes.c_int64).copy()
    nnz = int(indptr[-1])
    indices = _view(col_addr, nnz, ctypes.c_int64).copy()
    data = _view(val_addr, nnz, ctypes.c_double).copy()
    A = sp.csr_matrix(
        (data, indices.astype(np.int64), indptr), shape=(n, n)
    )
    config = json.loads(_params_json_of(params_handle) or "{}")
    S = _precond_from_config(A, config)
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = S
    return h


def precond_create_f(n, ptr_addr, col_addr, val_addr,
                     params_handle: int) -> int:
    A = _csr_from_f(n, ptr_addr, col_addr, val_addr)
    config = json.loads(_params_json_of(params_handle) or "{}")
    S = _precond_from_config(A, config)
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = S
    return h


def precond_apply(handle: int, rhs_addr: int, x_addr: int, n: int) -> int:
    """x = M⁻¹ rhs (amgcl_precond_apply parity: one preconditioner
    application, executed as the preonly solver)."""
    S = _handles[handle]
    rhs = _view(rhs_addr, n, ctypes.c_double).copy()
    x_out = _view(x_addr, n, ctypes.c_double)
    x, _ = S(rhs)
    x_out[:] = np.asarray(x, dtype=np.float64)
    return 0


def precond_report(handle: int) -> str:
    S = _handles[handle]
    P = getattr(S, "precond", S)
    return repr(P)
