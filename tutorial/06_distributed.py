"""Tutorial 6 — distributed solve over a device mesh (mirror of the
reference's MPI tutorial, docs/tutorial/poisson3DbMPI.rst, re-imagined for
TPU: the row partition is a `jax.sharding.Mesh` axis; halos ride ICI via
`lax.ppermute`, dots are `psum` reductions).

On a machine without multiple accelerators run with a virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tutorial/06_distributed.py
"""

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--shards", type=int, default=0, help="0 = all devices")
    args = ap.parse_args()

    import jax
    from amgcl_tpu.models.poisson import poisson3d
    from amgcl_tpu.parallel import DistSolver

    n = args.grid
    ndev = len(jax.devices())
    S_ = args.shards or ndev
    print(f"devices: {ndev}, shards: {S_}")

    A, rhs = poisson3d(n)
    t0 = time.time()
    solver = DistSolver(
        A, solver="cg",
        dims=(n, n, n) if n % S_ == 0 else None,
        precond="amg" if n % S_ == 0 else "relaxation",
        n_shards=S_, tol=1e-8, maxiter=200,
    )
    print(f"setup {time.time()-t0:.2f}s")
    t0 = time.time()
    x, info = solver(rhs)
    iters = int(info.iters)
    print(f"solve {time.time()-t0:.2f}s (incl. compile)")
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    print(f"iters {iters}  error {np.linalg.norm(r)/np.linalg.norm(rhs):.2e}")


if __name__ == "__main__":
    sys.exit(main())
