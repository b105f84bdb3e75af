"""Problem adapters (reference: amgcl/adapter/).

These transform a user's problem before it reaches the solver and map
solutions back — the capability surface of the reference's adapter layer:

* reorder       — Cuthill–McKee (adapter/reorder.hpp:48-211 +
                  reorder/cuthill_mckee.hpp:79); on TPU this is also a
                  *performance* adapter: bandwidth reduction converts
                  gather-bound ELL matrices into shift-only DIA ones.
* scaled_problem — symmetric diagonal scaling (adapter/scaled_problem.hpp).
* complex       — complex system → equivalent 2×2-real form
                  (adapter/complex.hpp).
* block_matrix  — scalar→block view: SparseMatrix.from_scipy(block=b)
                  (adapter/block_matrix.hpp:44-169).
"""

from .reorder import ReorderedProblem, cuthill_mckee
from .scaled import ScaledProblem
from .complex_adapter import complex_to_real, real_to_complex

__all__ = [
    "ReorderedProblem",
    "cuthill_mckee",
    "ScaledProblem",
    "complex_to_real",
    "real_to_complex",
]
