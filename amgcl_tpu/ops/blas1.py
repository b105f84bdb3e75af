"""BLAS-1 vector primitives.

TPU equivalents of the reference backend free functions clear / copy /
inner_product / axpby / axpbypcz / vmul / lin_comb
(reference: amgcl/backend/interface.hpp:191-420).  Under jit these all fuse
into neighbouring ops, so they exist mostly as a nameable vocabulary that
mirrors the reference API, plus the pluggable inner product used to swap a
`psum` reduction in for distributed solves (the role of the InnerProduct
policy, reference: amgcl/solver/detail/default_inner_product.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clear(x: jax.Array) -> jax.Array:
    return jnp.zeros_like(x)


def copy(x: jax.Array) -> jax.Array:
    return x


def axpby(a, x, b, y):
    """y = a*x + b*y."""
    return a * x + b * y


def axpbypcz(a, x, b, y, c, z):
    """z = a*x + b*y + c*z."""
    return a * x + b * y + c * z


def vmul(a, x, y, b, z):
    """z = a*(x∘y) + b*z  (elementwise multiply, used by SPAI/Jacobi)."""
    return a * x * y + b * z


def inner_product(x: jax.Array, y: jax.Array):
    """Sequential inner product.

    The reference compensates its OpenMP reduction (Kahan summation,
    amgcl/backend/builtin.hpp:1100).  On TPU we accumulate the lane
    reduction in f64 when inputs are f32 for the same effect, then cast
    back.
    """
    acc = jnp.float64 if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype
    return jnp.sum(x.astype(acc) * y.astype(acc)).astype(x.dtype)


def norm(x: jax.Array):
    return jnp.sqrt(inner_product(x, x))


def make_psum_inner_product(axis_name: str):
    """Distributed inner product: local dot + psum over the mesh axis.

    The SPMD analogue of mpi::inner_product (reference:
    amgcl/mpi/inner_product.hpp:44-67).
    """

    def ip(x, y):
        acc = jnp.float64 if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype
        local = jnp.sum(x.astype(acc) * y.astype(acc))
        return jax.lax.psum(local, axis_name).astype(x.dtype)

    return ip
