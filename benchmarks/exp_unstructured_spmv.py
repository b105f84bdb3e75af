"""Measure the ELL (gather) SpMV path vs the DIA kernel at equal sizes,
on chip — the design input for the unstructured fast path.

Also probes: does spatial ordering (locality) change XLA gather speed;
does x size (VMEM-resident vs HBM) matter; sorted-index gather.
"""

import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


def bench_spmv(A_dev, x, reps=30, label=""):
    from amgcl_tpu.ops.spmv import spmv

    @jax.jit
    def loop(x):
        def body(k, acc):
            y = spmv(A_dev, acc)
            # normalize to keep values finite; cheap elementwise
            return y * (1.0 / 8.0)
        return jax.lax.fori_loop(0, reps, body, x)

    y = loop(x); float(y[0])
    t0 = time.perf_counter(); y = loop(x); float(y[0])
    dt = (time.perf_counter() - t0) / reps
    gbs = (A_dev.nnz * (4 + 4) + A_dev.shape[0] * 8) / dt / 1e9
    print(f"{label}: {dt*1e3:.3f} ms  {A_dev.nnz/dt/1e9:.2f} Gnnz/s  "
          f"~{gbs:.0f} GB/s-equiv")
    return dt


def main():
    from amgcl_tpu.ops.formats import SparseMatrix, DiaMatrix
    from amgcl_tpu.models.poisson import poisson3d

    print(jax.devices())

    # --- 150^3 structured: DIA vs forced-ELL on the same operator
    n = 150
    A, _ = poisson3d(n, dtype=np.float32)
    x = jnp.ones(A.shape[0], jnp.float32)
    Ad = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    bench_spmv(Ad, x, label=f"150^3 DIA   (nnz={Ad.nnz/1e6:.1f}M)")
    Ae = SparseMatrix.from_scipy(A, dtype=jnp.float32)
    bench_spmv(Ae, x, label=f"150^3 ELL   (K={Ae.width})")

    # --- unstructured FEM 86k: mesh order vs RCM vs spatial order
    from amgcl_tpu.models.unstructured import fem_poisson_3d

    Au, _ = fem_poisson_3d(86000)
    Au32 = sp.csr_matrix(Au.astype(np.float32))
    xu = jnp.ones(Au.shape[0], jnp.float32)

    Ae0 = SparseMatrix.from_scipy(Au32, dtype=jnp.float32)
    bench_spmv(Ae0, xu, label=f"fem86k ELL mesh-order (K={Ae0.width})")

    perm = sp.csgraph.reverse_cuthill_mckee(Au32, symmetric_mode=True)
    B = Au32[perm][:, perm].tocsr()
    Ae1 = SparseMatrix.from_scipy(B, dtype=jnp.float32)
    bench_spmv(Ae1, xu, label="fem86k ELL RCM")

    # --- big unstructured (150^3-scale nnz): pad to 3.4M dofs
    Au2, _ = fem_poisson_3d(1_500_000, seed=3)
    Au2 = sp.csr_matrix(Au2.astype(np.float32))
    perm2 = sp.csgraph.reverse_cuthill_mckee(Au2, symmetric_mode=True)
    B2 = Au2[perm2][:, perm2].tocsr()
    x2 = jnp.ones(Au2.shape[0], jnp.float32)
    Ae2 = SparseMatrix.from_scipy(B2, dtype=jnp.float32)
    bench_spmv(Ae2, x2, label=f"fem1.5M ELL RCM (nnz={Ae2.nnz/1e6:.1f}M, K={Ae2.width})")


if __name__ == "__main__":
    main()
