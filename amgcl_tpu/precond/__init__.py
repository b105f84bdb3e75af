from .amg import AMG, AMGParams, Level, amg_cycle, amg_apply, make_amg_precond
from .as_preconditioner import AsPreconditioner, make_relax_precond
from .dummy import DummyPrecond

__all__ = [
    "AMG",
    "AMGParams",
    "Level",
    "amg_cycle",
    "amg_apply",
    "make_amg_precond",
    "AsPreconditioner",
    "make_relax_precond",
    "DummyPrecond",
]
