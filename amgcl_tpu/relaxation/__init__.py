"""Relaxation (smoother) layer.

Mirror of the reference's relaxation components (amgcl/relaxation/): each
smoother is a host-side ``setup`` that factorizes from the scipy matrix
(the reference also factorizes on the CPU at setup) and produces a pytree
*state*, plus pure functions ``apply_pre`` / ``apply_post`` that run one
sweep on device.  Dispatch is by state type at trace time, so the jitted
multigrid cycle stays branch-free.
"""

import jax.numpy as jnp

from .damped_jacobi import DampedJacobi, JacobiState
from .spai0 import SPAI0, SPAI0State
from .chebyshev import Chebyshev, ChebyshevState
from .gauss_seidel import GaussSeidel, GaussSeidelState
from .ilu0 import ILU0, ILUState
from .iluk import ILUK, ILUP
from .ilut import ILUT
from .ilu0_chow_patel import ILU0ChowPatel
from .spai1 import SPAI1, SPAI1State

SMOOTHERS = {
    "damped_jacobi": DampedJacobi,
    "spai0": SPAI0,
    "spai1": SPAI1,
    "chebyshev": Chebyshev,
    "gauss_seidel": GaussSeidel,
    "ilu0": ILU0,
    "ilu0_chow_patel": ILU0ChowPatel,
    "iluk": ILUK,
    "ilup": ILUP,
    "ilut": ILUT,
}


def make_smoother(name: str, **params):
    try:
        cls = SMOOTHERS[name]
    except KeyError:
        raise ValueError(
            f"unknown relaxation {name!r}; available: {sorted(SMOOTHERS)}"
        ) from None
    return cls(**params)


def apply_pre(state, A, rhs, x=None):
    """One smoothing sweep (forward for directional smoothers).
    Trace-time dispatch on the state type — the jitted cycle stays
    branch-free (reference: relaxation apply_pre,
    amgcl/relaxation/damped_jacobi.hpp:103).

    ``x=None`` means a zero initial guess: smoothers skip the A @ 0
    SpMV (the Pallas kernels are opaque custom calls, so XLA cannot
    fold it away — the reference's zero-guess relax path plays the
    same role, amgcl/amg.hpp:357-365)."""
    from .damped_jacobi import jacobi_apply
    from .spai0 import spai0_apply
    from .spai1 import spai1_apply
    from .chebyshev import chebyshev_apply
    from .gauss_seidel import gs_apply
    from .ilu0 import ilu_apply

    if isinstance(state, JacobiState):
        return jacobi_apply(state, A, rhs, x)
    if isinstance(state, SPAI0State):
        return spai0_apply(state, A, rhs, x)
    if isinstance(state, SPAI1State):
        return spai1_apply(state, A, rhs, x)
    if isinstance(state, ChebyshevState):
        return chebyshev_apply(state, A, rhs, x)
    if isinstance(state, GaussSeidelState):
        if x is None:
            x = jnp.zeros_like(rhs)
        return gs_apply(state, A, rhs, x, reverse=False)
    if isinstance(state, ILUState):
        return ilu_apply(state, A, rhs, x)
    raise TypeError(f"unknown smoother state {type(state)}")


def apply_post(state, A, rhs, x):
    """One smoothing sweep (backward for directional smoothers)."""
    from .gauss_seidel import gs_apply

    if isinstance(state, GaussSeidelState):
        return gs_apply(state, A, rhs, x, reverse=True)
    return apply_pre(state, A, rhs, x)


def apply_standalone(state, A, rhs, x=None):
    """Full smoother application for standalone preconditioner use
    (reference: relaxation ``apply``, e.g. gauss_seidel runs forward+backward
    sweeps — keeping the operator symmetric for CG).  ``x=None`` = zero
    initial guess (see apply_pre)."""
    from .gauss_seidel import gs_apply

    if isinstance(state, GaussSeidelState):
        if x is None:
            x = jnp.zeros_like(rhs)
        x = gs_apply(state, A, rhs, x, reverse=False)
        return gs_apply(state, A, rhs, x, reverse=True)
    return apply_pre(state, A, rhs, x)
