"""Distributed (multi-chip SPMD) layer — the TPU-native equivalent of the
reference's amgcl/mpi/ domain-decomposition layer (SURVEY.md §2.9)."""

from .dist import DistDia, DistEll, dist_spmv
from .partition import make_dist_matrix, partition_dia, partition_ell, pad_to_multiple
from .dist_solver import DistSolver

__all__ = [
    "DistDia",
    "DistEll",
    "dist_spmv",
    "make_dist_matrix",
    "partition_dia",
    "partition_ell",
    "pad_to_multiple",
    "DistSolver",
]
