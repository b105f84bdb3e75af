"""Distributed scaling harness — the role of the reference's
examples/mpi/spmm_scaling.cpp and the docs' dmem weak-scaling tables
(docs/benchmarks.rst:104-120, data schema `size np setup solve iters`).

Weak scaling: the 3D Poisson slab grows with the shard count (constant
rows per shard); for each mesh size we report distributed SpMV
throughput (nnz/s and effective GB/s) and the full coupled-AMG solve
time/iterations.  Run on a real pod for cross-chip numbers; on a single
host set XLA_FLAGS=--xla_force_host_platform_device_count=8 for a
virtual-mesh correctness/shape check (timings then reflect host cores,
not ICI).

Usage: python benchmarks/scaling.py [base_nx] [shard_counts...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from amgcl_tpu.parallel.partition import make_dist_matrix, pad_to_multiple
    from amgcl_tpu.parallel.dist import dist_spmv
    from amgcl_tpu.parallel.dist_solver import DistSolver

    base = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    counts = [int(c) for c in sys.argv[2:]] or None
    ndev = len(jax.devices())
    if counts is None:
        counts = [c for c in (1, 2, 4, 8, 16) if c <= ndev]
    elif any(c > ndev for c in counts):
        # env JAX_PLATFORMS=cpu alone is not reliable on some setups —
        # requesting more shards than devices would silently misparition.
        print(f"# clamping shard counts to {ndev} visible device(s); "
              f"set XLA_FLAGS=--xla_force_host_platform_device_count=N "
              f"for a virtual mesh")
        counts = sorted({min(c, ndev) for c in counts})

    print(f"# devices available: {ndev}; weak scaling, base {base}^3/shard")
    print("# S    n_rows      nnz    spmv_ms   Gnnz/s   GB/s   "
          "solve_s  iters")
    for S in counts:
        A, rhs = _slab(base, S)
        n = A.shape[0]
        nnz = A.nnz
        mesh = Mesh(np.array(jax.devices()[:S]), ("shard",))
        arrs, make_local = make_dist_matrix(A, S, dtype=jnp.float32)
        x = jnp.ones(n, dtype=jnp.float32)

        K = 50

        def loop(arrs, x):
            arrs = tuple(a[0] for a in arrs)
            M = make_local(arrs)
            return jax.lax.fori_loop(
                0, K, lambda i, v: dist_spmv(M, v) * (1.0 / 7.0), x
            )

        f = jax.jit(
            jax.shard_map(
                loop, mesh=mesh,
                in_specs=(tuple(P("shard") for _ in arrs), P("shard")),
                out_specs=P("shard"), check_vma=False,
            )
        )
        f(arrs, x).block_until_ready()
        t0 = time.time()
        f(arrs, x).block_until_ready()
        spmv_s = (time.time() - t0) / K

        bytes_moved = nnz * 4 + 2 * n * 4
        solver = DistSolver(
            A, "cg", mesh=mesh, precond="coupled_amg", tol=1e-8, maxiter=100
        )
        xs, info = solver(np.asarray(rhs))
        t0 = time.time()
        xs, info = solver(np.asarray(rhs))
        it = int(info.iters)
        solve_s = time.time() - t0

        print(
            f"{S:4d} {n:9d} {nnz:9d} {spmv_s*1e3:9.3f} "
            f"{nnz/spmv_s/1e9:8.2f} {bytes_moved/spmv_s/1e9:6.1f} "
            f"{solve_s:8.3f} {it:6d}"
        )


def _slab(base: int, S: int):
    """Weak-scaling problem: base x base x (base*S) Poisson so each shard
    owns a base^3 sub-slab."""
    import scipy.sparse as sp

    # anisotropic box via kron assembly of 1D Laplacians
    def lap1d(m):
        return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))

    nx = base * S
    I = sp.eye
    Ax = lap1d(nx)
    Ay = lap1d(base)
    Az = lap1d(base)
    A = (
        sp.kron(Ax, I(base * base))
        + sp.kron(I(nx), sp.kron(Ay, I(base)))
        + sp.kron(I(nx), sp.kron(I(base), Az))
    ).tocsr()
    A.sort_indices()
    return A, np.ones(A.shape[0])


if __name__ == "__main__":
    main()
