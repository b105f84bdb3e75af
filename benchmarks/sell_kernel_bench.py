"""On-chip SELL kernel microbenchmarks: v1 vs v2 vs block vs double-f32.

Measurement rule (see CLAUDE.md): the measured op's input is threaded
through the loop carry (y -> next x) so XLA cannot hoist the gathers,
and a scalar fetch forces the sync.

Usage: python benchmarks/sell_kernel_bench.py [npoints] [reps]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from amgcl_tpu.utils.hostmem import ensure_fast_heap

    ensure_fast_heap()

    import numpy as np
    import scipy.sparse as sp
    import jax
    import jax.numpy as jnp

    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from amgcl_tpu.models.unstructured import fem_poisson_3d, fem_elasticity_3d
    from amgcl_tpu.ops.pallas_sell import SellMatrix
    from amgcl_tpu.ops.pallas_sell2 import Sell2Matrix, Sell2F64Matrix
    from amgcl_tpu.ops.pallas_bsell import BlockSellMatrix

    t0 = time.time()
    A, _ = fem_poisson_3d(npoints)
    A = sp.csr_matrix(A)
    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[perm][:, perm].tocsr()
    A.sort_indices()
    print(f"# scalar: n={A.shape[0]} nnz={A.nnz} gen={time.time()-t0:.0f}s",
          file=sys.stderr)

    def bench(label, op, n, nnz, dtype=np.float32):
        try:
            return _bench(label, op, n, nnz, dtype)
        except Exception as e:
            print(f"{label:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            return None

    def _bench(label, op, n, nnz, dtype=np.float32):
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(n), dtype=dtype
        )

        @jax.jit
        def loop(x):
            def body(_, x):
                y = op(x)
                # renormalize so the carry stays finite
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, reps, body, x)

        y = loop(x0)
        _ = float(y[0])                     # compile + warm
        t0 = time.time()
        y = loop(x0)
        _ = float(y[0])
        dt = (time.time() - t0) / reps
        print(f"{label:18s} {dt*1e3:8.3f} ms/spmv   "
              f"{nnz/dt/1e9:6.2f} Gnnz/s")
        return dt

    S1 = SellMatrix.from_scipy(A, dtype=jnp.float32)
    S2 = Sell2Matrix.from_scipy(A, dtype=jnp.float32)
    S2b = Sell2Matrix.from_scipy(A, dtype=jnp.bfloat16)
    SD = Sell2F64Matrix.from_scipy(A.astype(np.float64))
    if S1 is not None:
        bench("sell_v1_f32", S1.spmv, A.shape[0], A.nnz)
    if S2 is not None:
        bench("sell_v2_f32", S2.spmv, A.shape[0], A.nnz)
    if S2b is not None:
        bench("sell_v2_bf16", S2b.spmv, A.shape[0], A.nnz)
    if SD is not None and bench(
        "sell_df64", SD.spmv, A.shape[0], A.nnz, dtype=np.float64
    ) is not None:
        # accuracy check on chip (interpret mode rounds differently)
        x = np.random.default_rng(1).standard_normal(A.shape[0])
        y = np.asarray(SD.spmv(jnp.asarray(x)))
        ref = A.astype(np.float64) @ x
        scale = np.abs(A.astype(np.float64)).dot(np.abs(x)).max()
        print(f"# df64 on-chip rel err: "
              f"{np.abs(y-ref).max()/scale:.2e}", file=sys.stderr)

    # block kernel on elasticity
    t0 = time.time()
    E, _, _ = fem_elasticity_3d(max(10_000, npoints // 3))
    E = sp.csr_matrix(E)
    B = sp.bsr_matrix(E, blocksize=(3, 3))
    pat = sp.csr_matrix(
        (np.ones(len(B.indices), np.float32), B.indices, B.indptr)
    )
    p = sp.csgraph.reverse_cuthill_mckee(pat, symmetric_mode=True)
    ps = (p[:, None] * 3 + np.arange(3)[None, :]).ravel()
    E = E[ps][:, ps].tocsr()
    E.sort_indices()
    print(f"# block3: n={E.shape[0]} nnz={E.nnz} gen={time.time()-t0:.0f}s",
          file=sys.stderr)
    SB = BlockSellMatrix.from_scipy(E, block=3, dtype=jnp.float32)
    if SB is not None and bench(
        "bsell3_f32", SB.spmv, E.shape[0], E.nnz
    ) is not None:
        x = np.random.default_rng(2).standard_normal(E.shape[0])
        y = np.asarray(SB.spmv(jnp.asarray(x).astype(jnp.float32)),
                       dtype=np.float64)
        ref = E @ x
        print(f"# bsell3 on-chip rel err: "
              f"{np.abs(y-ref).max()/np.abs(ref).max():.2e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
