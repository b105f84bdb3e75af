"""Focused on-chip measurements for the unstructured SpMV design:

1. raw XLA gather rate as a function of count and x size (VMEM-resident
   vs HBM-resident x), sorted vs unsorted indices;
2. ELL SpMV on the FEM matrix: mesh order vs RCM;
3. tiered (hybrid) ELL: slots split at degree quantiles, tail rows
   scatter-added — gathered elements ~ 1.3*nnz instead of K_max*n.
"""

import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


def timed(f, *args, reps=20, label="", work=None):
    g = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda k, acc: acc + f(*a)[0], jnp.float32(0)))
    r = g(*args); float(r)
    t0 = time.perf_counter(); r = g(*args); float(r)
    dt = (time.perf_counter() - t0) / reps
    rate = (work or 1) / dt / 1e9
    print(f"{label}: {dt*1e3:.3f} ms  {rate:.2f} Gelem/s")
    return dt


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)

    # 1. raw gather rates
    for n, m in ((86_000, 1_400_000), (86_000, 4_700_000),
                 (3_400_000, 23_600_000)):
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, m), jnp.int32)
        timed(lambda x, i: x[i], x, idx, work=m,
              label=f"gather rnd   n={n} m={m/1e6:.1f}M")
        idxs = jnp.sort(idx)
        timed(lambda x, i: x[i], x, idxs, work=m,
              label=f"gather sorted n={n} m={m/1e6:.1f}M")

    # 2. FEM ELL: mesh vs RCM order
    from amgcl_tpu.models.unstructured import fem_poisson_3d
    from amgcl_tpu.ops.formats import SparseMatrix
    from amgcl_tpu.ops.spmv import spmv

    Au, _ = fem_poisson_3d(86000)
    Au = sp.csr_matrix(Au.astype(np.float32))
    xu = jnp.ones(Au.shape[0], jnp.float32)
    for tag, M in (
        ("mesh", Au),
        ("rcm", (lambda p: Au[p][:, p].tocsr())(
            sp.csgraph.reverse_cuthill_mckee(Au, symmetric_mode=True))),
    ):
        Ae = SparseMatrix.from_scipy(M, dtype=jnp.float32)
        timed(lambda x: spmv(Ae, x), xu, work=Ae.width * Au.shape[0],
              label=f"fem86k ELL {tag} K={Ae.width} "
                    f"(els={Ae.width*Au.shape[0]/1e6:.1f}M)")

    # 3. tiered ELL prototype: K tiers at p50/p90/max of row degree
    A = Au
    n = A.shape[0]
    counts = np.diff(A.indptr)
    k0 = int(np.percentile(counts, 50))
    k1 = int(np.percentile(counts, 90))
    K = counts.max()
    print(f"tiers: k0={k0} k1={k1} K={K}")

    rowsarr = np.repeat(np.arange(n), counts)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)

    def tier(lo, hi):
        m = (offs >= lo) & (offs < hi)
        r = rowsarr[m]
        sel = np.unique(r)
        remap = np.zeros(n, np.int64)
        remap[sel] = np.arange(len(sel))
        width = hi - lo
        d = np.zeros((len(sel), width), np.float32)
        c = np.zeros((len(sel), width), np.int32)
        d[remap[r], offs[m] - lo] = A.data[m]
        c[remap[r], offs[m] - lo] = A.indices[m]
        return (jnp.asarray(d.T), jnp.asarray(c.T),
                jnp.asarray(sel.astype(np.int32)))

    d0, c0, _ = tier(0, k0)
    d1, c1, s1 = tier(k0, k1)
    d2, c2, s2 = tier(k1, K)
    els = d0.size + d1.size + d2.size
    print(f"tiered els={els/1e6:.2f}M vs flat {K*n/1e6:.2f}M")

    def spmv_tiered(x):
        y = jnp.sum(d0 * x[c0], axis=0)
        y = y.at[s1].add(jnp.sum(d1 * x[c1], axis=0))
        y = y.at[s2].add(jnp.sum(d2 * x[c2], axis=0))
        return y

    timed(spmv_tiered, xu, work=els, label="fem86k tiered-ELL")


if __name__ == "__main__":
    main()
