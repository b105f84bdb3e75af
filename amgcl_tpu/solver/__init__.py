"""Krylov solver suite (reference: amgcl/solver/)."""

from .common import SolveInfo, as_operator, as_precond
from .cg import cg
from .bicgstab import bicgstab
from .bicgstabl import bicgstabl
from .gmres import gmres, fgmres
from .lgmres import lgmres
from .idrs import idrs
from .richardson import richardson, preonly
from .refine import refine

SOLVERS = {
    "cg": cg,
    "bicgstab": bicgstab,
    "bicgstabl": bicgstabl,
    "gmres": gmres,
    "fgmres": fgmres,
    "lgmres": lgmres,
    "idrs": idrs,
    "richardson": richardson,
    "preonly": preonly,
    "refine": refine,
}


def make_solver_fn(name: str):
    try:
        return SOLVERS[name]
    except KeyError:
        raise ValueError(
            f"unknown solver {name!r}; available: {sorted(SOLVERS)}"
        ) from None
