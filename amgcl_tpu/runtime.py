"""Config-driven runtime dispatch.

The analogue of the reference's runtime layer (amgcl/*/runtime.hpp):
component selection by string, parameters as a nested dict addressed with
the same dotted paths as the reference's property tree
("precond.coarsening.type", "solver.tol", ...), with strict unknown-key
checking (reference: check_params, amgcl/util.hpp:144-165).
"""

from __future__ import annotations

import jax.numpy as jnp

from .api import Solver
from .precond.amg import AMGParams
from .coarsening import make_coarsening, COARSENING
from .relaxation import make_smoother, SMOOTHERS
from .solver import SOLVERS


def _check_keys(d: dict, allowed, path: str):
    unknown = set(d) - set(allowed)
    if unknown:
        raise ValueError(
            f"unknown parameter(s) {sorted(unknown)} at {path!r}; "
            f"allowed: {sorted(allowed)}"
        )


_AMG_KEYS = {
    "coarse_enough", "direct_coarse", "max_levels",
    "npre", "npost", "ncycle", "pre_cycles",
}

# Per-solver parameter surfaces (reference: each solver's params struct +
# check_params; e.g. solver/cg.hpp `{"tol","maxiter","ns_search",...}`).
# One shared set would silently accept e.g. solver.type=cg with M=50.
_COMMON_SOLVER_KEYS = {"tol", "abstol", "maxiter", "verbose"}
_SOLVER_KEYS = {
    "cg": {"ns_search"},
    "bicgstab": {"ns_search", "precond_side"},
    "bicgstabl": {"ns_search", "L", "delta", "convex"},
    "gmres": {"ns_search", "M"},
    "fgmres": {"ns_search", "M"},
    "lgmres": {"ns_search", "M", "K"},
    "idrs": {"ns_search", "s", "omega_angle", "replacement"},
    "richardson": {"ns_search", "damping"},
    "preonly": set(),
    "refine": {"inner", "inner_tol", "inner_maxiter"},
}


def solver_param_keys(stype: str) -> set:
    return _COMMON_SOLVER_KEYS | _SOLVER_KEYS.get(stype, set())

_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "bfloat16": jnp.bfloat16,
    "f32": jnp.float32,
    "f64": jnp.float64,
}


def expand_dotted(flat: dict) -> dict:
    """Turn {"precond.relax.type": "spai0"} into nested dicts — accepts the
    same key=value addressing as the reference CLI (examples/solver.cpp)."""
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
            if not isinstance(d, dict):
                raise ValueError(f"conflicting config path at {k!r}")
        d[parts[-1]] = v
    return out


def make_solver_from_config(A, config: dict | None = None, **kw) -> Solver:
    """Build a solver from a nested (or dotted) config dict.

    Mirrors the reference's ptree-driven factories:
      config = {
        "solver":  {"type": "cg", "tol": 1e-8, "maxiter": 100},
        "precond": {
            "class": "amg",
            "coarsening": {"type": "smoothed_aggregation", "eps_strong": .08},
            "relax": {"type": "spai0"},
            "coarse_enough": 3000, ...
        },
        "block": 1, "solver_dtype": "float64", "precond_dtype": "float32",
      }
    """
    config = dict(config or {})
    config.update(expand_dotted(kw))
    _check_keys(
        config,
        {"solver", "precond", "block", "solver_dtype", "precond_dtype"},
        "<root>",
    )

    sprm = dict(config.get("solver", {}))
    stype = sprm.pop("type", "cg")
    if stype not in SOLVERS:
        raise ValueError(f"unknown solver type {stype!r}")
    _check_keys(sprm, solver_param_keys(stype), f"solver({stype})")

    pprm = dict(config.get("precond", {}))
    pclass = pprm.pop("class", "amg")

    block = int(config.get("block", 1))
    solver_dtype = _DTYPES[str(config.get("solver_dtype", "float64"))]
    precond_dtype = _DTYPES[str(config.get("precond_dtype", "float32"))]

    if pclass == "amg":
        cprm = dict(pprm.pop("coarsening", {}))
        ctype = cprm.pop("type", "smoothed_aggregation")
        if ctype not in COARSENING:
            raise ValueError(f"unknown coarsening type {ctype!r}")
        if ctype == "smoothed_aggr_emin":
            _check_keys(
                cprm, {"eps_strong", "nullspace"}, "precond.coarsening"
            )
            cprm.setdefault("block_size", block)
        elif ctype == "smoothed_aggregation":
            _check_keys(
                cprm,
                {"eps_strong", "relax", "estimate_spectral_radius",
                 "power_iters", "nullspace", "aggregates"},
                "precond.coarsening",
            )
            cprm.setdefault("block_size", block)
        elif ctype == "aggregation":
            _check_keys(
                cprm, {"eps_strong", "over_interp", "nullspace"},
                "precond.coarsening",
            )
            cprm.setdefault("block_size", block)
        elif ctype == "ruge_stuben":
            _check_keys(
                cprm, {"eps_strong", "do_trunc", "eps_trunc"},
                "precond.coarsening",
            )
        elif ctype == "grid_aggregation":
            _check_keys(
                cprm,
                {"dims", "relax", "smooth", "eps_strong",
                 "estimate_spectral_radius", "power_iters"},
                "precond.coarsening",
            )
            if "dims" in cprm:
                cprm["dims"] = tuple(int(d) for d in cprm["dims"])
        coarsening = make_coarsening(ctype, **cprm)

        rprm = dict(pprm.pop("relax", {}))
        rtype = rprm.pop("type", "spai0")
        if rtype not in SMOOTHERS:
            raise ValueError(f"unknown relaxation type {rtype!r}")
        relaxation = make_smoother(rtype, **rprm)

        _check_keys(pprm, _AMG_KEYS, "precond")
        amg_params = AMGParams(**pprm)
        return Solver(
            A,
            solver=stype,
            precond="amg",
            block=block,
            solver_dtype=solver_dtype,
            precond_dtype=precond_dtype,
            coarsening=coarsening,
            relaxation=relaxation,
            amg_params=amg_params,
            **sprm,
        )

    if pclass == "relaxation":
        rprm = dict(pprm.pop("relax", {}))
        rtype = rprm.pop("type", "spai0")
        relaxation = make_smoother(rtype, **rprm)
        _check_keys(pprm, set(), "precond")
        return Solver(
            A,
            solver=stype,
            precond="relaxation",
            block=block,
            solver_dtype=solver_dtype,
            precond_dtype=precond_dtype,
            relaxation=relaxation,
            **sprm,
        )

    if pclass == "dummy":
        _check_keys(pprm, set(), "precond")
        return Solver(
            A,
            solver=stype,
            precond="dummy",
            block=block,
            solver_dtype=solver_dtype,
            precond_dtype=precond_dtype,
            **sprm,
        )

    if pclass == "cpr":
        from .precond.cpr import CPR

        _check_keys(
            pprm, {"block_size", "active_rows", "pprecond", "sprecond"},
            "precond",
        )
        sprec = pprm.pop("sprecond", None)
        if isinstance(sprec, dict):
            rp = dict(sprec)
            sprec = make_smoother(rp.pop("type", "ilu0"), **rp)
        P = CPR(
            A, pprm.pop("block_size", block), sprecond=sprec,
            dtype=precond_dtype, **pprm,
        )
        return Solver(
            A, solver=stype, precond=P, solver_dtype=solver_dtype,
            precond_dtype=precond_dtype, **sprm,
        )

    if pclass == "cpr_drs":
        from .precond.cpr import CPRDrs

        _check_keys(
            pprm,
            {"block_size", "active_rows", "pprecond", "sprecond",
             "weights", "eps_dd", "eps_ps"},
            "precond",
        )
        sprec = pprm.pop("sprecond", None)
        if isinstance(sprec, dict):
            rp = dict(sprec)
            sprec = make_smoother(rp.pop("type", "ilu0"), **rp)
        P = CPRDrs(
            A, pprm.pop("block_size", block), sprecond=sprec,
            dtype=precond_dtype, **pprm,
        )
        return Solver(
            A, solver=stype, precond=P, solver_dtype=solver_dtype,
            precond_dtype=precond_dtype, **sprm,
        )

    if pclass == "schur_pressure_correction":
        from .precond.schur import SchurPressureCorrection

        _check_keys(
            pprm,
            {"pmask", "usolver", "psolver", "type", "approx_schur",
             "adjust_p", "simplec_dia"},
            "precond",
        )
        P = SchurPressureCorrection(
            A, pprm.pop("pmask"), dtype=precond_dtype, **pprm
        )
        return Solver(
            A, solver=stype, precond=P, solver_dtype=solver_dtype,
            precond_dtype=precond_dtype, **sprm,
        )

    if pclass == "nested":
        # A full inner make_solver used as the preconditioner, composed
        # from the config tree alone (reference: runtime 'nested' class,
        # amgcl/preconditioner/runtime.hpp:54-98).
        from .precond.nested import NestedSolverPrecond

        _check_keys(
            pprm,
            {"solver", "precond", "block", "solver_dtype", "precond_dtype"},
            "precond",
        )
        pprm.setdefault("solver_dtype", "float32")
        inner = make_solver_from_config(A, pprm)
        P = NestedSolverPrecond(inner)
        return Solver(
            A, solver=stype, precond=P, solver_dtype=solver_dtype,
            precond_dtype=precond_dtype, **sprm,
        )

    if pclass in ("deflation", "deflated_solver"):
        # Deflated Krylov from config (reference: deflated_solver.hpp:45);
        # "vectors" gives explicit deflation vectors, constant=True the
        # constant vector.
        import numpy as np

        from .precond.deflation import DeflatedSolver

        _check_keys(
            pprm,
            {"vectors", "constant", "coarsening", "relax", "inner_precond"},
            "precond",
        )
        n = A.shape[0]
        if "vectors" in pprm:
            Z = np.asarray(pprm.pop("vectors"), dtype=np.float64)
            if Z.ndim != 2 or Z.shape[0] != n:
                raise ValueError(
                    f"deflation vectors must be (n, k), got {Z.shape}"
                )
        elif pprm.pop("constant", False):
            Z = np.ones((n, 1))
        else:
            raise ValueError(
                "deflation requires 'vectors' or 'constant': true"
            )
        pprm.pop("constant", None)
        inner_p = pprm.pop("inner_precond", "amg")
        return DeflatedSolver(
            A, Z, solver=stype, precond=inner_p,
            solver_dtype=solver_dtype, precond_dtype=precond_dtype, **sprm,
        )

    raise ValueError(f"unknown preconditioner class {pclass!r}")
