"""Per-kernel roofline microbenchmark (the observability target of
SURVEY.md §5: per-kernel bytes-moved → GB/s report).

Measures the core solve-phase primitives on the current device with
honest synchronization (scalar fetch — async dispatch otherwise lies on
tunnelled TPUs) and reports achieved GB/s vs the device's nominal HBM
bandwidth.

Run: python benchmarks/roofline.py [n]
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v4": 1228.0,
    "cpu": 50.0,
}


def device_bw():
    import jax

    d = str(jax.devices()[0])
    for k, v in HBM_GBPS.items():
        if k.lower() in d.lower():
            return v, d
    return 819.0, d


def timeit(fn, *args, reps=30):
    import jax

    r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[:1], r
    )  # force completion
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    # honest sync
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from amgcl_tpu.models.poisson import poisson3d
    from amgcl_tpu.ops.formats import DiaMatrix, SparseMatrix
    from amgcl_tpu.ops.spmv import spmv
    from amgcl_tpu.precond.grid_setup import GridAMG
    from amgcl_tpu.precond.amg import amg_apply

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    bw, dev = device_bw()
    print(f"device: {dev}, nominal HBM {bw:.0f} GB/s")

    A, rhs = poisson3d(n)
    N = A.shape[0]
    x32 = jnp.asarray(np.random.default_rng(0).standard_normal(N), jnp.float32)

    rows = []

    # DIA spmv f32
    D32 = DiaMatrix.from_scipy(A, dtype=jnp.float32)
    f = jax.jit(spmv)
    dt = timeit(f, D32, x32)
    bytes_moved = D32.data.nbytes + 2 * x32.nbytes  # data + x + y
    rows.append(("spmv DIA f32 (7 diag)", dt, bytes_moved))

    # DIA spmv f64
    D64 = DiaMatrix.from_scipy(A, dtype=jnp.float64)
    x64 = x32.astype(jnp.float64)
    dt = timeit(f, D64, x64)
    rows.append(("spmv DIA f64", dt, D64.data.nbytes + 2 * x64.nbytes))

    # ELL spmv f32 (gather path)
    E32 = SparseMatrix.from_scipy(A, dtype=jnp.float32)
    dt = timeit(f, E32, x32)
    rows.append(
        ("spmv ELL f32 (gather)", dt, E32.data.nbytes + E32.cols.nbytes + 2 * x32.nbytes)
    )

    # axpby
    g = jax.jit(lambda a, b: 1.01 * a + 0.5 * b)
    dt = timeit(g, x32, x32)
    rows.append(("axpby f32", dt, 3 * x32.nbytes))

    # dot
    h = jax.jit(lambda a, b: jnp.sum(a.astype(jnp.float64) * b.astype(jnp.float64)))
    dt = timeit(h, x32, x32)
    rows.append(("dot f32 (f64 accum)", dt, 2 * x32.nbytes))

    # full V-cycle
    amg = GridAMG(A, (n, n, n))
    vc = jax.jit(lambda lv, r: amg_apply(lv, r, amg.prm))
    dt = timeit(vc, amg.levels, x32, reps=10)
    vb = sum(
        (l.A.nbytes + 2 * 4 * l.A.shape[0] * 4) for l in amg.levels
    )
    rows.append(("V-cycle f32 (approx bytes)", dt, vb))

    print(f"\n{'kernel':35s} {'time':>10s} {'GB/s':>8s} {'% roofline':>10s}")
    for name, dt, b in rows:
        gbps = b / dt / 1e9
        print(f"{name:35s} {dt*1e3:8.3f}ms {gbps:8.1f} {100*gbps/bw:9.1f}%")


if __name__ == "__main__":
    main()
