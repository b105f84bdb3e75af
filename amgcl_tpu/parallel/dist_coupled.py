"""Distributed coupled preconditioners — the SPMD mirrors of mpi::cpr
(amgcl/mpi/cpr.hpp:44) and mpi::schur_pressure_correction
(amgcl/mpi/schur_pressure_correction.hpp:48).

Both compose from the same primitives as the serial versions, with every
operator row-sharded over the mesh axis:

* CPR: quasi-IMPES weights are computed globally on the host (setup is
  host-side, like the reference's CPU setup); the pressure hierarchy is a
  coupled distributed AMG (dist_general); the pressure restriction /
  prolongation stay *reshape-local* per shard because slabs are aligned
  to whole blocks — no communication beyond the hierarchy's own halos.
* Schur: the system is split (u, p) globally; u rows and p rows are each
  sharded into equal slabs, all four blocks (Kuu, Kup, Kpu, Padj) become
  distributed operators, and the matrix-free Schur Krylov loop runs
  inside shard_map with a psum inner product.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ..precond.amg import AMGParams
from .. import relaxation as rlx
from .dist import dist_spmv
from .dist_amg import _relax_apply
from .dist_general import (
    _mk_local, _partition_op, _shard_relax_padded,
    build_dist_general_amg, dist_general_apply,
)


# ======================================================================
# CPR
# ======================================================================

@dataclasses.dataclass
class DistCPRMeta:
    B: int              # block size
    np_loc: int         # pressure dofs per shard (padded)
    prm: AMGParams      # pressure hierarchy cycle params
    axis: str


def build_dist_cpr(
    K, S: int, *, block_size: int, axis: str = "shard",
    relaxation=None, pprecond: dict | None = None, dtype=jnp.float32,
):
    """Host-side setup of the distributed CPR state.

    Returns (sharded_tree, replicated_tree, meta); the trees stack per
    shard on the leading axis / are replicated, matching the DistSolver
    spec convention.  K must already be padded to a multiple of
    S*block_size with identity rows (the padded block-rows act as inert
    single-phase cells: unit diagonal blocks give quasi-IMPES weight
    (1,0,..) and an identity pressure equation).
    """
    K = sp.csr_matrix(K)
    K.sort_indices()
    n = K.shape[0]
    B = block_size
    if n % (S * B):
        raise ValueError("pad K to a multiple of n_shards*block_size first")
    np_ = n // B
    np_loc = np_ // S

    # Quasi-IMPES weights (reference: cpr.hpp:245-259) — vectorized over
    # the block diagonal.
    Kb = sp.bsr_matrix(K, blocksize=(B, B))
    Kb.sum_duplicates()
    rows_b = np.repeat(np.arange(np_), np.diff(Kb.indptr))
    dia_hits = rows_b == Kb.indices
    D = np.zeros((np_, B, B))
    D[rows_b[dia_hits]] = Kb.data[dia_hits]
    # singular diagonal blocks (can't happen for real problems) → identity
    sing = np.abs(np.linalg.det(D)) < 1e-300
    D[sing] = np.eye(B)
    W = np.linalg.inv(np.transpose(D, (0, 2, 1)))[:, 0, :]   # (np_, B)

    # Pressure system App = Fpp K Pcol.
    rows = np.repeat(np.arange(np_), B)
    Fpp = sp.csr_matrix((W.ravel(), (rows, np.arange(n))), shape=(np_, n))
    Pcol = sp.csr_matrix(
        (np.ones(np_), (np.arange(np_) * B, np.arange(np_))), shape=(n, np_)
    )
    App = sp.csr_matrix(Fpp @ K @ Pcol)
    App.sort_indices()

    pprecond = dict(pprecond or {})
    p_dlv, p_tail, p_prm = build_dist_general_amg(
        App, S, axis=axis, dtype=dtype, **pprecond
    )

    # Global-stage smoother on the full system (full-row states — exact,
    # the serial semantics; reference MPI uses local-block smoothers,
    # which DistSolver(precond='relaxation') also provides).
    K_arrs, K_meta = _partition_op(K, S, dtype)
    relaxation = relaxation or rlx.SPAI0()
    from ..ops.formats import SparseMatrix

    K_dev = SparseMatrix.from_scipy(K, dtype=dtype)
    state = relaxation.setup(K, K_dev)
    relax = _shard_relax_padded(state, n, n, S)

    W_st = jnp.asarray(W.reshape(S, np_loc, B), dtype=dtype)

    sharded = (K_arrs, relax, W_st, p_dlv)
    replicated = (p_tail,)
    meta = DistCPRMeta(B=B, np_loc=np_loc, prm=p_prm, axis=axis)
    return sharded, replicated, meta, K_meta


def dist_cpr_apply(sharded, replicated, meta: DistCPRMeta, K_meta,
                   r_loc, axis: str):
    """CPR application inside shard_map (reference: cpr.hpp:133-148)."""
    K_arrs, relax_st, W, p_dlv = sharded
    (p_tail,) = replicated
    K = _mk_local(tuple(a[0] for a in K_arrs), K_meta, axis)
    relax = jax.tree_util.tree_map(lambda x: x[0], relax_st)
    W_loc = W[0]                       # (np_loc, B)

    dt = W_loc.dtype
    rr = r_loc.astype(dt)
    # Stage 1: global smoother from zero initial guess.
    x = _relax_apply(relax, K, rr, jnp.zeros_like(rr))
    rs = rr - dist_spmv(K, x)
    # Stage 2: pressure correction (reshape-local transfers).
    rp = jnp.sum(W_loc * rs.reshape(meta.np_loc, meta.B), axis=1)
    xp = dist_general_apply(p_dlv, p_tail, rp, meta.prm, axis)
    corr = jnp.zeros((meta.np_loc, meta.B), dt).at[:, 0].set(xp)
    x = x + corr.reshape(-1)
    return x.astype(r_loc.dtype)


# ======================================================================
# Schur pressure correction
# ======================================================================

@dataclasses.dataclass
class DistSchurMeta:
    nu_loc: int
    np_loc: int
    type: int
    approx_schur: bool
    u_prm: AMGParams
    p_prm: AMGParams
    Kup_meta: tuple
    Kpu_meta: tuple
    Kpp_meta: tuple
    p_solver: str
    p_kw: dict
    axis: str


def schur_permutation(pmask: np.ndarray, S: int):
    """Shard-interleaved (u, p) reordering.

    Each shard's slab becomes [its nu_loc u-dofs | its np_loc p-dofs] so
    the split is a static local slice inside shard_map — the TPU layout
    of the reference's per-rank ownership of both u and p rows
    (amgcl/mpi/schur_pressure_correction.hpp:48).  Virtual padding dofs
    (identity rows) fill the last shards.  Returns (new2old, u_order,
    p_order, nu_loc, np_loc); new2old < 0 marks virtual dofs.
    """
    iu = np.flatnonzero(~pmask)
    ip = np.flatnonzero(pmask)
    nu, np_ = len(iu), len(ip)
    nu_pad = ((nu + S - 1) // S) * S
    np_pad = ((np_ + S - 1) // S) * S
    u_order = np.concatenate([iu, np.full(nu_pad - nu, -1, dtype=np.int64)])
    p_order = np.concatenate([ip, np.full(np_pad - np_, -1, dtype=np.int64)])
    nu_loc, np_loc = nu_pad // S, np_pad // S
    chunks = []
    for s in range(S):
        chunks.append(u_order[s * nu_loc : (s + 1) * nu_loc])
        chunks.append(p_order[s * np_loc : (s + 1) * np_loc])
    new2old = np.concatenate(chunks)
    return new2old, u_order, p_order, nu_loc, np_loc


def _sub_matrix(A_ext: sp.csr_matrix, rows: np.ndarray, cols: np.ndarray,
                n_orig: int):
    """A_ext[rows][:, cols] where negative ids map to the virtual identity
    tail of A_ext (caller appends identity rows for pads)."""
    nv = A_ext.shape[0] - n_orig
    # map: virtual slots are assigned sequentially per index array
    def fix(idx, base):
        out = idx.copy()
        neg = np.flatnonzero(idx < 0)
        out[neg] = n_orig + base + np.arange(len(neg))
        return out
    r = fix(rows, 0)
    c = fix(cols, 0) if cols is rows else fix(cols, int((rows < 0).sum()))
    M = sp.csr_matrix(A_ext[r][:, c])
    M.sort_indices()
    return M


def build_dist_schur(
    K, pmask, S: int, *, axis: str = "shard", type: int = 1,
    approx_schur: bool = True, adjust_p: int = 1, simplec_dia: bool = True,
    usolver: dict | None = None, psolver: dict | None = None,
    dtype=jnp.float32,
):
    """Host-side setup of the distributed Schur pressure correction.

    Returns (sharded, replicated, meta, new2old).  The caller must solve
    the *permuted padded* system (A_perm = A_ext[new2old][:, new2old]).
    """
    K = sp.csr_matrix(K)
    K.sort_indices()
    n = K.shape[0]
    pmask = np.asarray(pmask, dtype=bool)
    new2old, u_order, p_order, nu_loc, np_loc = schur_permutation(pmask, S)
    nv = int((new2old < 0).sum())
    A_ext = sp.block_diag([K, sp.eye(nv)], format="csr") if nv else K

    Kuu = _sub_matrix(A_ext, u_order, u_order, n)
    Kup = _sub_matrix(A_ext, u_order, p_order, n)
    Kpu = _sub_matrix(A_ext, p_order, u_order, n)
    Kpp = _sub_matrix(A_ext, p_order, p_order, n)

    # SIMPLEC / diagonal approximation of Kuu^{-1} (hpp:simplec_dia).
    nu_pad = Kuu.shape[0]
    if simplec_dia:
        rows = np.repeat(np.arange(nu_pad), np.diff(Kuu.indptr))
        s_ = np.bincount(rows, weights=np.abs(Kuu.data), minlength=nu_pad)
    else:
        s_ = np.abs(Kuu.diagonal())
    s_[s_ == 0] = 1.0
    Mdia = 1.0 / s_

    if adjust_p == 0:
        Padj = Kpp
    else:
        L = sp.csr_matrix(Kpu @ sp.diags(Mdia) @ Kup)
        Padj = sp.csr_matrix(
            Kpp - (sp.diags(L.diagonal()) if adjust_p == 1 else L)
        )

    usolver = dict(usolver or {})
    psolver = dict(psolver or {})
    p_cfg = dict(psolver.pop("solver", {}))
    p_solver = p_cfg.pop("type", "cg")
    p_cfg.setdefault("tol", 1e-2)
    p_cfg.setdefault("maxiter", 16)

    # Nested distributed hierarchies (preonly application, the serial
    # default): U on Kuu, P's preconditioner on the adjusted matrix.
    u_dlv, u_tail, u_prm = build_dist_general_amg(
        Kuu, S, axis=axis, dtype=dtype, **usolver.get("precond", {})
    )
    p_dlv, p_tail, p_prm = build_dist_general_amg(
        Padj, S, axis=axis, dtype=dtype, **psolver.get("precond", {})
    )

    Kup_arrs, Kup_meta = _partition_op(Kup, S, dtype)
    Kpu_arrs, Kpu_meta = _partition_op(Kpu, S, dtype)
    # The Schur action uses the *true* Kpp; Padj only builds the
    # pressure preconditioner hierarchy (reference keeps a pristine Kpp
    # for its spmv, schur_pressure_correction.hpp:264-271).
    Kpp_arrs, Kpp_meta = _partition_op(Kpp, S, dtype)
    M_st = jnp.asarray(Mdia.reshape(S, nu_loc), dtype=dtype)

    sharded = (Kup_arrs, Kpu_arrs, Kpp_arrs, M_st, u_dlv, p_dlv)
    replicated = (u_tail, p_tail)
    meta = DistSchurMeta(
        nu_loc=nu_loc, np_loc=np_loc, type=type, approx_schur=approx_schur,
        u_prm=u_prm, p_prm=p_prm, Kup_meta=Kup_meta, Kpu_meta=Kpu_meta,
        Kpp_meta=Kpp_meta, p_solver=p_solver, p_kw=p_cfg, axis=axis,
    )
    return sharded, replicated, meta, new2old


def dist_schur_apply(sharded, replicated, meta: DistSchurMeta, inner,
                     r_loc, axis: str):
    """Schur pressure correction inside shard_map (reference apply:
    schur_pressure_correction.hpp:186-257, types 1 and 2)."""
    from ..solver import make_solver_fn

    Kup_arrs, Kpu_arrs, Kpp_arrs, M_st, u_dlv, p_dlv = sharded
    u_tail, p_tail = replicated
    Kup = _mk_local(tuple(a[0] for a in Kup_arrs), meta.Kup_meta, axis)
    Kpu = _mk_local(tuple(a[0] for a in Kpu_arrs), meta.Kpu_meta, axis)
    Kpp = _mk_local(tuple(a[0] for a in Kpp_arrs), meta.Kpp_meta, axis)
    M = M_st[0]

    dt = M.dtype
    rr = r_loc.astype(dt)
    fu = rr[: meta.nu_loc]
    fp = rr[meta.nu_loc :]

    usolve = lambda f: dist_general_apply(u_dlv, u_tail, f, meta.u_prm, axis)
    p_prec = lambda r: dist_general_apply(p_dlv, p_tail, r, meta.p_prm, axis)

    def schur_op(x):
        y = dist_spmv(Kpp, x)
        t = dist_spmv(Kup, x)
        u = M * t if meta.approx_schur else usolve(t)
        return y - dist_spmv(Kpu, u)

    p_fn = make_solver_fn(meta.p_solver)

    def psolve(f):
        x, _ = p_fn(schur_op, p_prec, f, jnp.zeros_like(f),
                    inner_product=inner, **meta.p_kw)
        return x

    if meta.type == 1:
        u = usolve(fu)
        fp2 = fp - dist_spmv(Kpu, u)
        p = psolve(fp2)
        u = usolve(fu - dist_spmv(Kup, p))
    else:
        p = psolve(fp)
        u = usolve(fu - dist_spmv(Kup, p))

    return jnp.concatenate([u, p]).astype(r_loc.dtype)
