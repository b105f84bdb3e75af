from .formats import SparseMatrix, diagonal
from .spmv import spmv, spmv_t, residual
from . import blas1

__all__ = ["SparseMatrix", "diagonal", "spmv", "spmv_t", "residual", "blas1"]
