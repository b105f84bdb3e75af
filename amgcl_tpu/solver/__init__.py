"""Krylov solver suite (reference: amgcl/solver/)."""

from .common import SolveInfo, as_operator, as_precond
from .cg import cg
from .bicgstab import bicgstab
from .gmres import gmres, fgmres
from .richardson import richardson, preonly

SOLVERS = {
    "cg": cg,
    "bicgstab": bicgstab,
    "gmres": gmres,
    "fgmres": fgmres,
    "richardson": richardson,
    "preonly": preonly,
}


def make_solver_fn(name: str):
    try:
        return SOLVERS[name]
    except KeyError:
        raise ValueError(
            f"unknown solver {name!r}; available: {sorted(SOLVERS)}"
        ) from None
