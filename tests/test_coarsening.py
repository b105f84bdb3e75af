"""Coarsening component tests: aggregation semantics, tentative P,
smoothed P, Ruge-Stuben C/F interpolation, and full-solver convergence for
each coarsening (the role of the coarsening axis of the reference's
combinatorial sweep)."""

import numpy as np
import pytest
import scipy.sparse as sp

from amgcl_tpu.models.poisson import poisson2d, poisson3d
from amgcl_tpu.coarsening.aggregates import (
    plain_aggregates, pointwise_aggregates, strong_connections,
)
from amgcl_tpu.coarsening.tentative import tentative_prolongation
from amgcl_tpu.coarsening.smoothed_aggregation import SmoothedAggregation
from amgcl_tpu.coarsening.ruge_stuben import RugeStuben, cfsplit, connect
from amgcl_tpu.coarsening.aggregation import Aggregation
from amgcl_tpu import make_solver


def test_plain_aggregates_cover():
    A, _ = poisson2d(10)
    aggr = plain_aggregates(A, 0.08)
    assert aggr.count > 0
    valid = aggr.id >= 0
    # all Poisson nodes are strongly connected -> none removed
    assert valid.all()
    assert aggr.id.max() == aggr.count - 1
    # every aggregate non-empty
    assert len(np.unique(aggr.id)) == aggr.count
    # coarsening ratio sane for 5-point stencil
    assert 3 <= A.shape[0] / aggr.count <= 20


def test_lonely_node_removed():
    A = sp.csr_matrix(sp.diags([2.0, 3.0, 4.0]))
    B, _ = poisson2d(4)
    M = sp.block_diag([A, B]).tocsr()
    aggr = plain_aggregates(M, 0.08)
    assert (aggr.id[:3] == -2).all()       # diagonal-only rows removed
    assert (aggr.id[3:] >= 0).all()


def test_tentative_piecewise_constant():
    A, _ = poisson2d(8)
    aggr = plain_aggregates(A, 0.08)
    P, B = tentative_prolongation(A.shape[0], aggr)
    assert B is None
    assert P.shape == (A.shape[0], aggr.count)
    # each row has exactly one unit entry
    assert (P.data == 1.0).all()
    assert (np.diff(P.indptr) == 1).all()


def test_tentative_nullspace_qr():
    A, _ = poisson2d(8)
    aggr = plain_aggregates(A, 0.08)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    B = np.stack([np.ones(n), rng.standard_normal(n)], axis=1)
    P, Bc = tentative_prolongation(n, aggr, nullspace=B)
    assert P.shape == (n, 2 * aggr.count)
    assert Bc.shape == (2 * aggr.count, 2)
    # Range of P must contain the nullspace: P @ Bc == B
    np.testing.assert_allclose(P @ Bc, B, atol=1e-12)


def test_pointwise_aggregates_block():
    A, _ = poisson2d(8)
    Ab = sp.csr_matrix(sp.kron(A, np.eye(2)))
    aggr = pointwise_aggregates(Ab, 0.08, block=2)
    assert aggr.count % 2 == 0
    # dofs of one block share an aggregate *pair* base
    ids = aggr.id.reshape(-1, 2)
    assert ((ids[:, 1] - ids[:, 0]) == 1).all()


def test_rs_cfsplit_covers():
    A, _ = poisson2d(12)
    S, forced = connect(A, 0.25)
    is_C = cfsplit(A, S, forced)
    # every F point has a strong C neighbour (RS axiom)
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    ok = np.zeros(n, dtype=bool)
    ok[is_C] = True
    strong_C = S & is_C[A.indices]
    has_c = np.zeros(n, dtype=bool)
    has_c[rows[strong_C]] = True
    assert (ok | has_c).all()


@pytest.mark.parametrize("coarsening", ["smoothed_aggregation", "aggregation", "ruge_stuben"])
def test_coarsening_convergence(coarsening):
    from amgcl_tpu.coarsening import make_coarsening

    A, rhs = poisson3d(12)
    S = make_solver(
        A, solver="cg", tol=1e-8, maxiter=200,
        coarsening=make_coarsening(coarsening),
    )
    x, info = S(rhs)
    r = rhs - A @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-7


def test_rs_interpolation_exact_for_c_points():
    A, _ = poisson2d(10)
    rs = RugeStuben()
    P, R = rs.transfer_operators(A)
    S, forced = connect(A, 0.25)
    is_C = cfsplit(A, S, forced)
    cidx = np.cumsum(is_C) - 1
    for i in np.nonzero(is_C)[0][:10]:
        row = P.getrow(i)
        assert row.nnz == 1 and row.data[0] == 1.0 and row.indices[0] == cidx[i]
