from .report import hierarchy_report
from .profiler import Profiler, tic, toc, profile_report

__all__ = ["hierarchy_report", "Profiler", "tic", "toc", "profile_report"]
