from .amg import AMG, AMGParams, Level, amg_cycle, amg_apply, make_amg_precond
from .as_preconditioner import AsPreconditioner, make_relax_precond
from .dummy import DummyPrecond
from .cpr import CPR, CPRDrs
from .schur import SchurPressureCorrection
from .deflation import DeflatedSolver, constant_deflation

__all__ = [
    "CPR",
    "CPRDrs",
    "SchurPressureCorrection",
    "DeflatedSolver",
    "constant_deflation",
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
