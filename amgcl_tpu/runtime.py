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
    _check_keys(
        sprm,
        {"tol", "abstol", "maxiter", "M", "damping", "verbose", "L",
         "delta", "s", "K", "ns_search", "omega", "inner", "inner_tol",
         "inner_maxiter", "precond_side"},
        "solver",
    )

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

    raise ValueError(f"unknown preconditioner class {pclass!r}")
