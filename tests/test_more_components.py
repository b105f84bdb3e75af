"""Tests for the remaining capability rows: energy-min SA, as_scalar,
rigid body modes, make_block_solver, runtime CPR/Schur, ns_search."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from amgcl_tpu.models.poisson import poisson3d, poisson2d
from amgcl_tpu.models.coupled import reservoir2d, stokes2d
from amgcl_tpu import make_solver, make_solver_from_config
from amgcl_tpu.api import make_block_solver
from amgcl_tpu.coarsening import SmoothedAggrEMin, AsScalar, RugeStuben
from amgcl_tpu.coarsening.rigid_body_modes import rigid_body_modes


def _check(S, A, rhs, tol=1e-6):
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(rhs)
    assert rel < tol, f"rel={rel} iters={int(info.iters)}"
    return int(info.iters)


def test_smoothed_aggr_emin():
    A, rhs = poisson3d(12)
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=100,
                    coarsening=SmoothedAggrEMin())
    iters = _check(S, A, rhs, tol=1e-7)
    assert iters <= 40


def test_as_scalar_ruge_stuben_block():
    A, _ = poisson2d(10)
    Ab = sp.csr_matrix(sp.kron(A, np.eye(2)))
    rhs = np.ones(Ab.shape[0])
    S = make_solver(
        Ab, solver="cg", block=2, tol=1e-8, maxiter=200,
        coarsening=AsScalar(RugeStuben(), block_size=2),
    )
    _check(S, Ab, rhs, tol=1e-7)


def test_rigid_body_modes_shapes():
    rng = np.random.default_rng(0)
    coo2 = rng.standard_normal((25, 2))
    B2 = rigid_body_modes(2, coo2)
    assert B2.shape == (50, 3)
    # orthonormal
    np.testing.assert_allclose(B2.T @ B2, np.eye(3), atol=1e-12)
    coo3 = rng.standard_normal((25, 3))
    B3 = rigid_body_modes(3, coo3)
    assert B3.shape == (75, 6)
    np.testing.assert_allclose(B3.T @ B3, np.eye(6), atol=1e-12)
    # translations + rotations are in the span: rigid displacement fields
    # have zero strain — check one rotation field around z
    x, y, z = coo3.T
    rot = np.zeros(75)
    rot[0::3], rot[1::3] = -y, x
    proj = B3 @ (B3.T @ rot)
    np.testing.assert_allclose(proj, rot, atol=1e-10)


def test_make_block_solver():
    from amgcl_tpu.models.poisson import poisson3d_block

    A, rhs = poisson3d_block(8, block=3)
    S = make_block_solver(A, block=3, tol=1e-8, maxiter=100)
    _check(S, A, rhs, tol=1e-7)


def test_runtime_cpr():
    A, rhs = reservoir2d(10)
    S = make_solver_from_config(
        A,
        {
            "solver": {"type": "bicgstab", "tol": 1e-8, "maxiter": 200},
            "precond": {"class": "cpr", "block_size": 2},
        },
    )
    _check(S, A, rhs)


def test_runtime_schur():
    A, rhs, pmask = stokes2d(10)
    S = make_solver_from_config(
        A,
        {
            "solver": {"type": "fgmres", "tol": 1e-8, "maxiter": 200},
            "precond": {
                "class": "schur_pressure_correction",
                "pmask": pmask,
                "approx_schur": True,
            },
        },
    )
    _check(S, A, rhs)


def test_ns_search_zero_rhs():
    """Zero rhs with nonzero x0: CG should drive x toward the nullspace
    (here: decay toward zero for SPD A, without NaNs)."""
    import jax.numpy as jnp
    from amgcl_tpu.solver import SOLVERS
    from amgcl_tpu.ops.formats import from_scipy_auto

    A, _ = poisson2d(8)
    Ad = from_scipy_auto(A, dtype=jnp.float64)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(64))
    x, info = SOLVERS["cg"](
        Ad, None, jnp.zeros(64), x0, tol=1e-10, maxiter=200, ns_search=True
    )
    assert np.isfinite(np.asarray(x)).all()
    assert float(jnp.linalg.norm(Ad.data)) > 0


def test_poisson3d_dia_matches_host():
    """Device-assembled DIA Poisson equals the host CSR generator."""
    import numpy as np
    import jax.numpy as jnp
    from amgcl_tpu.models.poisson import poisson3d, poisson3d_dia

    A, _ = poisson3d(8)
    Ad, rhs = poisson3d_dia(8, dtype=jnp.float64)
    diff = abs(Ad.to_scipy() - A)
    assert diff.max() == 0
    assert Ad.nnz == A.nnz


def test_device_matrix_input():
    """make_solver accepts a device DiaMatrix directly (zero host work)."""
    import numpy as np
    import jax.numpy as jnp
    from amgcl_tpu.models.poisson import poisson3d, poisson3d_dia
    from amgcl_tpu.coarsening.grid_aggregation import GridAggregation
    from amgcl_tpu import make_solver

    n = 12
    Ad, rhs = poisson3d_dia(n, dtype=jnp.float64)
    S = make_solver(Ad, solver="cg", tol=1e-8, maxiter=100,
                    coarsening=GridAggregation(dims=(n, n, n)))
    x, info = S(np.asarray(rhs))
    A, _ = poisson3d(n)
    r = np.ones(A.shape[0]) - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.sqrt(A.shape[0]) < 1e-7


def test_crs_builder():
    """Assemble-on-demand builder (adapter::crs_builder role)."""
    import numpy as np
    from amgcl_tpu.adapter.crs_builder import CrsBuilder
    from amgcl_tpu import make_solver

    n = 64

    def row(i):
        cols, vals = [i], [2.0]
        if i > 0:
            cols.append(i - 1); vals.append(-1.0)
        if i < n - 1:
            cols.append(i + 1); vals.append(-1.0)
        return cols, vals

    B = CrsBuilder(n, row)
    S = make_solver(B, solver="cg", precond="relaxation", tol=1e-8,
                    maxiter=500)
    rhs = np.ones(n)
    x, info = S(rhs)
    A = B.tocsr()
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_graph_partition():
    """BFS graph-growing partition balances slabs and cuts the bandwidth
    of a shuffled grid problem back to near-local."""
    import numpy as np
    import scipy.sparse as sp
    from amgcl_tpu.models.poisson import poisson2d
    from amgcl_tpu.parallel.graph_partition import (
        partition_bfs, apply_partition, merge_small)

    A, _ = poisson2d(16)
    rng = np.random.default_rng(0)
    p = rng.permutation(A.shape[0])
    Pm = sp.csr_matrix((np.ones(len(p)), (np.arange(len(p)), p)),
                       shape=A.shape)
    Ashuf = (Pm @ A @ Pm.T).tocsr()

    perm = partition_bfs(Ashuf, 4)
    assert sorted(perm) == list(range(A.shape[0]))
    B, inv = apply_partition(Ashuf, perm)
    rows = np.repeat(np.arange(B.shape[0]), np.diff(B.indptr))
    bw = int(np.abs(B.indices - rows).max())
    rows0 = np.repeat(np.arange(Ashuf.shape[0]), np.diff(Ashuf.indptr))
    bw0 = int(np.abs(Ashuf.indices - rows0).max())
    assert bw < bw0  # reordering reduces the halo reach

    assert merge_small(10_000, 8) == 8
    assert merge_small(100, 8) == 1
    assert merge_small(1024, 8, min_per_shard=256) == 4


def test_graph_partition_kl_refinement():
    """Kernighan-Lin boundary refinement reduces the slab edge cut while
    preserving exact slab sizes (the parmetis/ptscotch quality role,
    amgcl/mpi/partition/parmetis.hpp)."""
    import numpy as np
    import scipy.sparse as sp
    from amgcl_tpu.models.unstructured import fem_poisson_2d
    from amgcl_tpu.parallel.graph_partition import (
        partition_bfs, refine_kl, edge_cut)

    A, _ = fem_poisson_2d(3000)
    A = sp.csr_matrix(A)
    S = 4
    perm = partition_bfs(A, S)
    cut0 = edge_cut(A, perm, S)
    perm2 = refine_kl(A, perm, S)
    cut1 = edge_cut(A, perm2, S)
    # valid permutation, same slab sizes by construction
    assert sorted(perm2) == list(range(A.shape[0]))
    assert cut1 < cut0, (cut0, cut1)
    # identity-ish cases
    assert refine_kl(A, perm, 1) is perm


def test_cli_partition_flag(tmp_path):
    """--partition bfs-kl solves a shuffled problem on a CPU mesh and
    returns the solution in the original row order."""
    import subprocess
    import sys as _sys
    import numpy as np
    import scipy.sparse as sp
    from amgcl_tpu.models.poisson import poisson2d
    from amgcl_tpu.utils import io as aio

    A, rhs = poisson2d(24)
    rng = np.random.default_rng(3)
    p = rng.permutation(A.shape[0])
    Pm = sp.csr_matrix((np.ones(len(p)), (np.arange(len(p)), p)),
                       shape=A.shape)
    Ashuf = (Pm @ A @ Pm.T).tocsr()
    rhss = rhs[p]
    aio.mm_write(str(tmp_path / "A.mtx"), Ashuf)
    aio.mm_write(str(tmp_path / "b.mtx"), rhss[:, None])
    out = tmp_path / "x.mtx"
    env = dict(__import__("os").environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [_sys.executable, "-m", "amgcl_tpu.cli", "-A", str(tmp_path / "A.mtx"),
         "-f", str(tmp_path / "b.mtx"), "--shards", "4",
         "--partition", "bfs-kl", "-o", str(out),
         "solver.tol=1e-8"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "edge_cut" in r.stderr
    x = np.asarray(aio.mm_read(str(out))).ravel()
    res = np.linalg.norm(rhss - Ashuf @ x) / np.linalg.norm(rhss)
    assert res < 1e-7, res


def test_cli_dist_setup_flag(tmp_path):
    """--dist-setup runs the fully sharded setup+solve from the CLI
    (distributed PMIS + distributed Galerkin; mpi::amg role)."""
    import subprocess
    import sys as _sys
    import numpy as np
    from amgcl_tpu.models.poisson import poisson2d
    from amgcl_tpu.utils import io as aio

    A, rhs = poisson2d(24)
    aio.mm_write(str(tmp_path / "A.mtx"), A)
    out = tmp_path / "x.mtx"
    env = dict(__import__("os").environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [_sys.executable, "-m", "amgcl_tpu.cli", "-A", str(tmp_path / "A.mtx"),
         "--shards", "4", "--dist-setup", "-o", str(out),
         "solver.tol=1e-8", "precond.coarse_enough=64"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    x = np.asarray(aio.mm_read(str(out))).ravel()
    res = np.linalg.norm(rhs - A @ x) / np.linalg.norm(rhs)
    assert res < 1e-7, res


def test_bandwidth_report():
    """Roofline observability: the report runs and contains GB/s."""
    from amgcl_tpu import make_solver
    from amgcl_tpu.models.poisson import poisson3d
    from amgcl_tpu.utils.report import bandwidth_report

    A, rhs = poisson3d(12)
    S = make_solver(A, solver="cg", tol=1e-8, maxiter=100)
    rep = bandwidth_report(S, rhs, repeats=2)
    assert "GB/s" in rep and "iterations" in rep


def test_profile_aggregation():
    """Per-shard profile min/avg/max aggregation (reference:
    perf_counter/mpi_aggregator.hpp)."""
    import time

    from amgcl_tpu.utils.profiler import Profiler, aggregate_profiles

    profs = []
    for s in range(4):
        p = Profiler(f"shard{s}")
        with p.scope("local setup"):
            with p.scope("factorize"):
                time.sleep(0.001 * (s + 1))
        profs.append(p)
    rep = aggregate_profiles(profs)
    assert "4 shards" in rep
    assert "local setup" in rep and "factorize" in rep
    assert "min" in rep and "avg" in rep and "max" in rep
