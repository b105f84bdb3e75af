"""Sharded general setup (parallel/dist_setup.py): the distributed
PMIS + distributed Galerkin product role of the reference's MPI layer
(amgcl/mpi/coarsening/pmis.hpp, mpi/distributed_matrix.hpp:858-1066).

The invariant under test: the sharded setup reproduces the *serial*
device hierarchy exactly — same aggregates, same operators — so
iteration counts match the serial solver on the same matrix.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from amgcl_tpu.ops.formats import SparseMatrix
from amgcl_tpu.precond.amg import AMGParams
from amgcl_tpu.precond.ell_setup import DeviceGeneralAMG
from amgcl_tpu.parallel.dist_setup import ShardedGeneralAMG
from amgcl_tpu import relaxation as rlx


def _poisson2d_rcm(nx, ny, jitter=0.0, seed=0):
    """5-point 2D Poisson, RCM-ordered (bounded bandwidth — the same
    ingest-reorder assumption the halo formats make)."""
    n = nx * ny
    main = np.full(n, 4.0)
    if jitter:
        rng = np.random.default_rng(seed)
        main += jitter * rng.random(n)
    ex = np.ones(n)
    A = sp.diags(
        [main, -ex, -ex, -ex, -ex], [0, -1, 1, -nx, nx], (n, n)
    ).tocsr()
    # drop the wrap-around terms of the 1D stencil at row boundaries
    mask = np.ones(n, bool)
    lil = A.tolil()
    for i in range(nx, n, nx):
        lil[i, i - 1] = 0
        lil[i - 1, i] = 0
    A = lil.tocsr()
    A.eliminate_zeros()
    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[perm][:, perm].tocsr()
    A.sort_indices()
    return A


S = 4
PRM = AMGParams(coarse_enough=60)


@pytest.fixture(scope="module")
def problem():
    A = _poisson2d_rcm(40, 50, jitter=0.3)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(A.shape[0])
    return A, b


@pytest.fixture(scope="module")
def sharded(problem):
    A, _ = problem
    return ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64
    )


@pytest.fixture(scope="module")
def serial(problem):
    A, _ = problem
    return DeviceGeneralAMG(
        SparseMatrix.from_scipy(A, dtype=jnp.float64),
        params=PRM, dtype=jnp.float64,
    )


def test_builds_multiple_sharded_levels(sharded):
    assert len(sharded.dist_levels) >= 2
    assert len(sharded.tail) >= 1


def test_level0_roundtrip(problem, sharded):
    A, _ = problem
    back = sharded.level0_compact()
    d = (back - A).tocoo()
    assert (abs(d.data).max() if d.nnz else 0) < 1e-12


def test_aggregate_counts_match_serial(sharded, serial):
    ser_sizes = [lvl.A.shape[0] for lvl in serial.levels]
    sh_sizes = [st["n"] for st in sharded.setup_stats["levels"]]
    sh_sizes += [lvl.A.shape[0] for lvl in sharded.tail]
    assert ser_sizes == sh_sizes


def test_coarse_operator_matches_serial(sharded, serial):
    """The level-1 Galerkin operator: sharded build == serial build."""
    lvl = sharded.dist_levels[1]
    S_ = S
    data = np.asarray(lvl.A_arrs[0])[:, :, 0, 0, :]
    colsp = np.asarray(lvl.A_arrs[1])
    _, K, nlocp = data.shape
    # padded -> compact map from the recorded per-shard counts
    counts = []
    st = sharded.setup_stats["levels"]
    nc1 = st[0]["nc"]
    # reconstruct compact ids: padded position -> compact (via l1 cnt)
    # (the tail/l0 index arrays only cover ends; recompute from ids)
    serial_A1 = serial.levels[1].A
    d1 = np.asarray(serial_A1.data[:, 0, 0, :])
    c1 = np.asarray(serial_A1.cols)

    # compare as scipy matrices in compact numbering
    # infer per-shard live counts at level 1 from dead rows (all-zero)
    live = (data != 0).any(axis=1)
    cnts = live.sum(axis=1)
    pad2comp = -np.ones(S_ * nlocp, np.int64)
    pos = 0
    for s in range(S_):
        pad2comp[s * nlocp: s * nlocp + cnts[s]] = np.arange(
            pos, pos + cnts[s]
        )
        pos += cnts[s]
    assert pos == nc1

    def to_csr(d, c, rows_pad=None):
        K_, n_ = d.shape
        rr = np.broadcast_to(np.arange(n_)[None, :], d.shape)
        m = d != 0
        return sp.coo_matrix(
            (d[m], (rr[m], c[m])), shape=(n_, max(int(c.max()) + 1, n_))
        ).tocsr()

    rows_pad = np.broadcast_to(
        np.arange(S_ * nlocp)[None, :],
        (K, S_ * nlocp),
    )
    dd = data.transpose(1, 0, 2).reshape(K, -1)
    cc = colsp.transpose(1, 0, 2).reshape(K, -1)
    m = dd != 0
    rr = pad2comp[rows_pad[m]]
    c2 = pad2comp[cc[m]]
    assert (rr >= 0).all() and (c2 >= 0).all()
    A1_sh = sp.coo_matrix(
        (dd[m], (rr, c2)), shape=(nc1, nc1)
    ).tocsr()

    rr1 = np.broadcast_to(np.arange(nc1)[None, :], d1.shape)
    m1 = d1 != 0
    A1_se = sp.coo_matrix(
        (d1[m1], (rr1[m1], c1[m1])), shape=(nc1, nc1)
    ).tocsr()
    diff = (A1_sh - A1_se).tocoo()
    rel = abs(diff.data).max() / abs(A1_se.data).max() if diff.nnz else 0
    assert rel < 1e-10


def test_solve_matches_serial_iterations(problem, sharded, serial):
    A, b = problem
    run = sharded.make_solver(tol=1e-8, maxiter=100)
    x, iters, rel = run(b)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7

    from amgcl_tpu.solver.cg import cg
    x_s, info = cg(
        serial.levels[0].A, serial.apply, jnp.asarray(b),
        tol=1e-8, maxiter=100,
    )
    assert iters == int(info.iters)


def test_jacobi_relaxation(problem):
    A, b = problem
    sh = ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64,
        relaxation=rlx.DampedJacobi(),
    )
    run = sh.make_solver(tol=1e-8, maxiter=200)
    x, iters, rel = run(b)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7


def test_from_parts_entry(problem):
    """The production entry: per-shard row blocks, never a global
    assembly inside the builder."""
    A, b = problem
    n = A.shape[0]
    size = -(-n // S)
    parts = [A[i: min(i + size, n)] for i in range(0, n, size)]
    sh = ShardedGeneralAMG.from_parts(
        parts, params=PRM, min_loc=16, dtype=jnp.float64
    )
    run = sh.make_solver(tol=1e-8, maxiter=100)
    x, iters, rel = run(b)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7


def test_chebyshev_relaxation(problem):
    """Sharded Chebyshev smoother states (distributed Gershgorin bound +
    the distributed three-term sweep)."""
    A, b = problem
    sh = ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64,
        relaxation=rlx.Chebyshev(degree=3),
    )
    run = sh.make_solver(tol=1e-8, maxiter=200)
    x, iters, rel = run(b)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7


def test_ilu0_local_block_relaxation(problem):
    """Local-diagonal-block ILU0 at the finest level (the reference's MPI
    relaxation model, amgcl/mpi/relaxation/ilu0.hpp): block-Jacobi between
    shards, ILU0 within — converges, and in fewer iterations than plain
    SPAI0 on the same hierarchy."""
    A, b = problem
    sh = ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64,
        relaxation=rlx.ILU0(),
    )
    run = sh.make_solver(tol=1e-8, maxiter=200)
    x, iters, rel = run(b)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7

    base = ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64,
    )
    xb, iters_b, _ = base.make_solver(tol=1e-8, maxiter=200)(b)
    assert int(iters) <= int(iters_b)


# ----------------------------------------------------------------------
# block systems: sharded condensed-graph PMIS (the reference's MPI
# pointwise compression, mpi/coarsening/pmis.hpp:50,103+)
# ----------------------------------------------------------------------

BLK = 2


@pytest.fixture(scope="module")
def block_problem():
    """Generic-valued 2x2-block SPD system: Poisson(jitter) x SPD block
    coupling (values generic so strength comparisons can't tie)."""
    Ap = _poisson2d_rcm(24, 30, jitter=0.3)
    M = np.array([[2.1, 0.37], [0.37, 1.55]])
    A = sp.kron(Ap, M, format="csr")
    A.sort_indices()
    rng = np.random.default_rng(3)
    b = rng.standard_normal(A.shape[0])
    return A, b


@pytest.fixture(scope="module")
def block_sharded(block_problem):
    A, _ = block_problem
    return ShardedGeneralAMG.from_global(
        A, S, params=PRM, min_loc=16, dtype=jnp.float64,
        block_size=BLK,
    )


@pytest.fixture(scope="module")
def block_serial(block_problem):
    A, _ = block_problem
    from amgcl_tpu.precond.ell_setup import DeviceGeneralAMG as DG
    return DG(A, params=PRM, dtype=jnp.float64, block=BLK)


def test_block_aggregate_counts_match_serial(block_sharded, block_serial):
    ser_sizes = [lvl.A.shape[0] for lvl in block_serial.levels]
    sh_sizes = [st["n"] for st in block_sharded.setup_stats["levels"]]
    sh_sizes += [lvl.A.shape[0] for lvl in block_sharded.tail]
    assert ser_sizes == sh_sizes
    # every level stays block-aligned
    assert all(s % BLK == 0 for s in sh_sizes)


def test_block_coarse_operator_matches_serial(block_sharded,
                                              block_serial):
    lvl = block_sharded.dist_levels[1]
    data = np.asarray(lvl.A_arrs[0])[:, :, 0, 0, :]
    colsp = np.asarray(lvl.A_arrs[1])
    S_, K, nlocp = data.shape
    nc1 = block_sharded.setup_stats["levels"][0]["nc"]

    live = (data != 0).any(axis=1)
    cnts = live.sum(axis=1)
    pad2comp = -np.ones(S_ * nlocp, np.int64)
    pos = 0
    for s in range(S_):
        pad2comp[s * nlocp: s * nlocp + cnts[s]] = np.arange(
            pos, pos + cnts[s]
        )
        pos += cnts[s]
    assert pos == nc1

    rows_pad = np.broadcast_to(
        np.arange(S_ * nlocp)[None, :], (K, S_ * nlocp)
    )
    dd = data.transpose(1, 0, 2).reshape(K, -1)
    cc = colsp.transpose(1, 0, 2).reshape(K, -1)
    m = dd != 0
    A1_sh = sp.coo_matrix(
        (dd[m], (pad2comp[rows_pad[m]], pad2comp[cc[m]])),
        shape=(nc1, nc1),
    ).tocsr()

    serial_A1 = block_serial.levels[1].A
    d1 = np.asarray(serial_A1.data[:, 0, 0, :])
    c1 = np.asarray(serial_A1.cols)
    rr1 = np.broadcast_to(np.arange(nc1)[None, :], d1.shape)
    m1 = d1 != 0
    A1_se = sp.coo_matrix(
        (d1[m1], (rr1[m1], c1[m1])), shape=(nc1, nc1)
    ).tocsr()
    diff = (A1_sh - A1_se).tocoo()
    rel = abs(diff.data).max() / abs(A1_se.data).max() if diff.nnz else 0
    assert rel < 1e-10


def test_block_solve_matches_serial_iterations(block_problem,
                                               block_sharded,
                                               block_serial):
    A, b = block_problem
    run = block_sharded.make_solver(tol=1e-8, maxiter=200)
    x, iters, rel = run(b)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7

    from amgcl_tpu.solver.cg import cg
    x_s, info = cg(
        block_serial.levels[0].A, block_serial.apply, jnp.asarray(b),
        tol=1e-8, maxiter=200,
    )
    assert iters == int(info.iters)


def test_block_misaligned_partition_rejected(block_problem):
    A, _ = block_problem
    n = A.shape[0]
    parts = [A[: n // 2 + 1], A[n // 2 + 1:]]   # off-boundary split
    with pytest.raises(ValueError, match="block_size"):
        ShardedGeneralAMG.from_parts(
            parts, params=PRM, dtype=jnp.float64, block_size=BLK
        )
