"""Sharded (SPMD) general AMG setup — no host or single shard ever holds
the global matrix.

The reference's MPI setup builds each level with a *distributed* SpGEMM
(amgcl/mpi/distributed_matrix.hpp:858-1066: remote-column harvesting +
local/remote product blocks) and distributed PMIS aggregation
(amgcl/mpi/coarsening/pmis.hpp:50).  This module plays the same role the
TPU-native way: the fine matrix arrives row-sharded over a
`jax.sharding.Mesh` axis (planar ELL, compact global column ids) and
every setup stage runs under `shard_map`:

* **PMIS aggregation** — the same jittable scatter-max rounds as the
  serial device setup (coarsening/device_setup.py::pmis_ids_device),
  with neighbour values exchanged through windowed slab `ppermute`s
  sized by the measured column reach (`_reach_shard` pre-pass): every
  gather reads a (2W+1)-slab window and every scatter-max folds 2W
  overlap slabs back to their owners — per-shard traffic and memory
  O(n/S + halo), the SPMD dual of the reference's neighbour-sparse
  comm_pattern (mpi/distributed_matrix.hpp:93-184).  Weights are a
  hash of the compact global index, so the sharded sweep reproduces
  the serial aggregation bit-for-bit.
* **Smoothed prolongation** — row-local given the gathered aggregate-id
  vector.
* **AP** — A's column window of P's rows is satisfied by two contiguous
  `ppermute` halo slabs (the DistEllH exchange, sized by the measured
  column reach), then the gather-free sort-based product of the serial
  device setup runs on local rows.
* **Galerkin contraction + transpose** — product terms are fine-row
  local; each shard sort-compresses its terms into a ±1-shard coarse
  row window, the overlap slabs ride two `ppermute`s to their owners,
  and a small merge sort finishes each shard's coarse rows.

Coarse levels keep *compact global* numbering (identical to the serial
setup — aggregate k of the sharded build is aggregate k of the serial
build) laid out as per-shard slabs padded to the max shard count; dead
padding rows are structurally zero and stay inert through the solve.

The solve phase reuses the coupled distributed machinery of
dist_general.py (`DistGenLevel` + `_gen_cycle`); the consolidated tail
(small levels + dense coarse inverse) is replicated, with a gather
permutation mapping the padded layout onto the tail's compact indexing.

Iteration counts match the serial `DeviceGeneralAMG` on the same matrix
(tests assert equality): same aggregates, same operators, distributed
layout.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..coarsening.device_setup import (
    spgemm_ap_device, _terms_to_ell,
)
from ..precond.amg import AMGParams
from ..precond.ell_setup import _merge_partial_ell, _round8
from .. import relaxation as rlx
from .dist_general import DistGenLevel


_UNDEF = jnp.int32(-1)
_REMOVED = jnp.int32(-2)


# ----------------------------------------------------------------------
# shard-local helpers
# ----------------------------------------------------------------------

def _pad_owner(col, offs, nlocp):
    """compact global index -> (owner shard, padded physical index)."""
    owner = jnp.searchsorted(offs, col, side="right").astype(jnp.int32) - 1
    owner = jnp.clip(owner, 0, offs.shape[0] - 1)
    return owner, owner * nlocp + (col - offs[owner])


def _pidx(col, offs, nlocp):
    return _pad_owner(col, offs, nlocp)[1]


def _w_of(idx, seed):
    """The PMIS weight at a compact global index — identical to the
    serial pmis_ids_device hash, computable anywhere without exchange."""
    h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)
         ^ (jnp.uint32(seed) * jnp.uint32(0x9E3779B9)))
    h = h ^ (h >> 16)
    w = ((h.astype(jnp.int64) & jnp.int64(0x7FFFFFFF)) << 32) \
        | idx.astype(jnp.int64)
    return w + 1


def _shift_perm(ndev, h):
    """ppermute pairs moving data h shards to the right (negative h:
    left); edge shards receive zeros."""
    if h >= 0:
        return [(i, i + h) for i in range(ndev - h)]
    return [(i, i + h) for i in range(-h, ndev)]


def _exchange_last(a, W, axis):
    """[W left slabs | local | W right slabs] exchange along the LAST
    axis of a 2-D array — W whole-slab hops in each direction (edge
    shards receive zeros).  W=1 is the classic DistEllH halo."""
    if W == 0:
        return a
    ndev = jax.lax.axis_size(axis)
    lefts, rights = [], []
    for h in range(W, 0, -1):
        lefts.append(jax.lax.ppermute(a, axis, _shift_perm(ndev, h)))
    for h in range(1, W + 1):
        rights.append(jax.lax.ppermute(a, axis, _shift_perm(ndev, -h)))
    return jnp.concatenate(lefts + [a] + rights, axis=1)


def _win_vec(v, W, axis):
    """Windowed neighbour exchange of a per-shard vector: returns the
    (2W+1)·n window [W left slabs | v | W right slabs].  Replaces a
    full-length all_gather with O(W·n/S) traffic; indexing is
    ``win[pidx - (my-W)*n]``."""
    return _exchange_last(v[None, :], W, axis)[0]


def _scatter_max_win(jwin, vals, W, nloc, axis, dtype):
    """Scatter-max ``vals`` at window positions ``jwin`` into the owning
    shards' local slabs: each shard builds its (2W+1)-slab window buffer,
    the 2W overlap slabs ppermute to their owners, and owners fold them
    in with elementwise max — the windowed dual of the all_gather+pmax
    scatter (per-shard traffic O(W·n/S), not O(n))."""
    ndev = jax.lax.axis_size(axis)
    nwin = (2 * W + 1) * nloc
    buf = jnp.zeros(nwin, dtype).at[jwin.reshape(-1)].max(vals.reshape(-1))
    out = buf[W * nloc:(W + 1) * nloc]
    for h in range(1, W + 1):
        # my slab (W-h) holds contributions to shard my-h -> ship left
        sl = buf[(W - h) * nloc:(W - h + 1) * nloc]
        out = jnp.maximum(
            out, jax.lax.ppermute(sl, axis, _shift_perm(ndev, -h))
        )
        sr = buf[(W + h) * nloc:(W + h + 1) * nloc]
        out = jnp.maximum(
            out, jax.lax.ppermute(sr, axis, _shift_perm(ndev, h))
        )
    return out


def _condense_shard(data, cols, cnt, *, b, kb, nlocp, axis):
    """Per-shard block-Frobenius condensation: scalar ELL rows (K, nlocp)
    -> block ELL (kb, nlocp//b) whose entry (I, J) is ||A_IJ||_F over the
    b×b block — the pointwise compression the reference's MPI PMIS uses
    for block systems (mpi/coarsening/pmis.hpp:50,103+).  Row-local: no
    exchange (every scalar entry of block row I lives in my slab)."""
    data, cols = data[0], cols[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    nlocb = nlocp // b
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    valid = (data != 0) & alive[None, :]
    rows_b = jnp.broadcast_to((li // b)[None, :], cols.shape)
    cols_b = cols // b
    v2 = jnp.where(valid, data * data, 0.0)
    d, c, kmax, _ = _terms_to_ell(
        rows_b.reshape(-1), cols_b.reshape(-1), v2.reshape(-1),
        nlocb, kb,
    )
    return jnp.sqrt(d)[None], c[None], kmax[None]


def _block_strong_shard(data, cols, C_cols, strong_b, offs, cnt, *,
                        b, nlocp, axis):
    """Scalar-entry strength mask from the per-shard block strength
    pattern (the sharded mirror of device_setup.block_strong_scalar): a
    scalar off-diagonal entry is kept iff its enclosing block (I, J) is
    a strong block connection or lies on the block diagonal."""
    data, cols, C_cols, strong_b = (
        data[0], cols[0], C_cols[0], strong_b[0]
    )
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    gidx = offs[my] + li
    I_b = gidx // b                                      # (nlocp,) global
    Cc_exp = jnp.repeat(C_cols, b, axis=1)               # (Kb, nlocp)
    Sb_exp = jnp.repeat(strong_b, b, axis=1)
    Jb = cols // b                                       # (K, nlocp)

    def one(jrow):
        return jnp.any((Cc_exp == jrow[None, :]) & Sb_exp, axis=0)

    strongJ = jax.lax.map(one, Jb)
    intra = Jb == I_b[None, :]
    off = cols != gidx[None, :]
    out = (strongJ | intra) & off & (data != 0) & alive[None, :]
    return out[None]


def _reach_shard(data, cols, offs, cnt, *, nlocp, axis):
    """Pre-pass: max distance (in padded rows) any of my structural
    column references travels outside my slab — measured before PMIS so
    the window width is static in the traced setup programs."""
    data, cols = data[0], cols[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    valid = (data != 0) & alive[None, :]
    pc = _pidx(cols, offs, nlocp)
    lo = my * nlocp
    hi = lo + nlocp
    reach = jnp.where(valid, jnp.maximum(lo - pc, pc - hi + 1), 0)
    return jnp.maximum(jnp.max(reach), 0)[None]


# ----------------------------------------------------------------------
# stage A: sharded PMIS (+ column-reach measurement)
# ----------------------------------------------------------------------

def _pmis_shard(data, cols, offs, cnt, eps2, seed, *, nlocp, S, axis,
                W, max_rounds=64):
    """Per-shard body: returns (ids_coarse, my_count, strong, halo_need).
    ids are compact global *coarse* numbers (serial ordering), -2 for
    removed/dead rows.

    All neighbour traffic is windowed (``W`` whole-slab hops each way,
    measured by the `_reach_shard` pre-pass): gathers read a
    (2W+1)-slab window, scatters fold 2W overlap slabs back with
    `_scatter_max_win` — per-shard traffic O(W·n/S + halo), the SPMD
    mirror of the reference's neighbour-sparse comm_pattern
    (amgcl/mpi/distributed_matrix.hpp:93-184), not O(n).  W = S-1
    covers every shard, so any measured reach stays exact."""
    data, cols = data[0], cols[0]
    ndev = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    gidx = offs[my] + li
    valid = (data != 0) & alive[None, :]
    pc = _pidx(cols, offs, nlocp)
    pc = jnp.where(valid, pc, 0)

    # window coordinates: padded-global position -> offset in my
    # (2W+1)-slab window (clipped; only `valid`/`strong` slots are read)
    nwin = (2 * W + 1) * nlocp
    jw = jnp.clip(pc - (my - W) * nlocp, 0, nwin - 1)
    jw = jnp.where(valid, jw, 0)

    dia = jnp.sum(jnp.where((cols == gidx[None, :]) & valid, data, 0.0),
                  axis=0)
    dia_win = _win_vec(dia, W, axis)
    off_mask = (cols != gidx[None, :]) & valid
    strong = off_mask & (
        data * data > eps2 * jnp.abs(dia)[None, :] * jnp.abs(dia_win[jw])
    )
    sjw = jnp.where(strong, jw, 0)

    # column reach (for the AP halo): how far outside my padded slab do
    # my valid column references go?
    lo = my * nlocp
    hi = lo + nlocp
    reach = jnp.where(
        valid, jnp.maximum(lo - pc, pc - hi + 1), 0
    )
    halo_need = jnp.maximum(jnp.max(reach), 0)

    has_strong = jnp.any(strong, axis=0)
    has_in = _scatter_max_win(
        sjw, strong.astype(jnp.int32), W, nlocp, axis, jnp.int32
    ) > 0
    live0 = (has_strong | has_in) & alive
    ids0 = jnp.where(live0, _UNDEF, _REMOVED)

    w = _w_of(gidx, seed)
    w_cols = _w_of(cols, seed)

    def nbr_max(key):
        key_win = _win_vec(key, W, axis)
        kj = jnp.where(strong, key_win[sjw], jnp.int64(0))
        m = jnp.maximum(key, jnp.max(kj, axis=0))
        m = jnp.maximum(m, _scatter_max_win(
            sjw,
            jnp.where(strong,
                      jnp.broadcast_to(key[None, :], strong.shape),
                      jnp.int64(0)),
            W, nlocp, axis, jnp.int64,
        ))
        return m

    def round_(st):
        ids, it = st
        live = ids == _UNDEF
        key = jnp.where(live, w, jnp.int64(0))
        roots = live & (key == nbr_max(nbr_max(key)))
        ids = jnp.where(roots, gidx, ids)

        # 1-hop join to the heaviest adjacent root (a root's id is its
        # own index, so no gather is needed for the joined value)
        root_win = _win_vec(roots.astype(jnp.int8), W, axis)
        adj = jnp.where(strong & (root_win[sjw] > 0), w_cols,
                        jnp.int64(0))
        best = jnp.max(adj, axis=0)
        arg = jnp.argmax(adj, axis=0)
        join = live & ~roots & (best > 0)
        target = cols[arg, li]
        ids = jnp.where(join, target, ids)

        # 2-hop capture: follow a just-joined strong neighbour to its
        # aggregate (ids windowed after the join update)
        join_win = _win_vec(join.astype(jnp.int8), W, axis)
        adj2 = jnp.where(strong & (join_win[sjw] > 0), w_cols,
                         jnp.int64(0))
        best2 = jnp.max(adj2, axis=0)
        arg2 = jnp.argmax(adj2, axis=0)
        join2 = (ids == _UNDEF) & (best2 > 0)
        target2 = cols[arg2, li]
        ids_win = _win_vec(ids, W, axis)
        t2w = jnp.clip(
            _pidx(target2, offs, nlocp) - (my - W) * nlocp, 0, nwin - 1
        )
        ids = jnp.where(join2, ids_win[t2w], ids)
        return ids, it + 1

    def cond(st):
        ids, it = st
        und = jax.lax.pmax(
            jnp.any(ids == _UNDEF).astype(jnp.int32), axis
        )
        return (und > 0) & (it < max_rounds)

    ids, _ = jax.lax.while_loop(cond, round_, (ids0, jnp.int32(0)))
    ids = jnp.where(ids == _UNDEF, gidx, ids)

    # renumber roots to compact coarse ids in global fine order (the
    # serial cumsum order: shard-major + local order == fine order).
    # My root can sit up to 2 hops of strong edges away (join at 1,
    # 2-hop capture at 2), so the rank window is 2W slabs wide.
    is_root = alive & (ids == gidx) & (ids >= 0)
    my_count = jnp.sum(is_root.astype(jnp.int32))
    counts = jax.lax.all_gather(my_count, axis)            # (S,) scalars
    coff = jnp.cumsum(counts) - counts
    lrank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    cvec = jnp.where(is_root, coff[my] + lrank, -1)
    W2 = min(2 * W, ndev - 1)          # axis_size is static
    nwin2 = (2 * W2 + 1) * nlocp
    c_win = _win_vec(cvec, W2, axis)
    rootw = jnp.clip(
        _pidx(jnp.maximum(ids, 0), offs, nlocp) - (my - W2) * nlocp,
        0, nwin2 - 1,
    )
    ids_c = jnp.where(ids >= 0, c_win[rootw], ids)
    return ids_c[None], my_count[None], strong[None], halo_need[None]


# ----------------------------------------------------------------------
# stage B: smoothed prolongation (row-local + ids gather)
# ----------------------------------------------------------------------

def _prolong_shard(data, cols, ids_c, strong, offs, cnt, omega, *,
                   nlocp, axis, W):
    data, cols, ids_c, strong = data[0], cols[0], ids_c[0], strong[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    gidx = offs[my] + li
    valid = (data != 0) & alive[None, :]
    pc = jnp.where(valid, _pidx(cols, offs, nlocp), 0)

    dia = jnp.sum(jnp.where((cols == gidx[None, :]) & valid, data, 0.0),
                  axis=0)
    off_mask = (cols != gidx[None, :]) & valid
    weak = off_mask & ~strong
    dia_F = dia + jnp.sum(jnp.where(weak, data, 0.0), axis=0)
    inv_dF = jnp.where(
        dia_F != 0, 1.0 / jnp.where(dia_F == 0, 1.0, dia_F), 0.0
    )

    # windowed aggregate-id lookup (neighbour-sparse, like PMIS)
    nwin = (2 * W + 1) * nlocp
    jw = jnp.where(
        valid, jnp.clip(pc - (my - W) * nlocp, 0, nwin - 1), 0
    )
    ids_win = _win_vec(ids_c, W, axis)
    agg_j = ids_win[jw]
    okj = strong & (agg_j >= 0) & (ids_c >= 0)[None, :]
    P_off = jnp.where(okj, -omega * inv_dF[None, :] * data, 0.0)
    Pc_off = jnp.where(okj, agg_j, 0).astype(jnp.int32)

    oki = ids_c >= 0
    P_dia = jnp.where(oki, 1.0 - omega, 0.0)[None, :].astype(data.dtype)
    Pc_dia = jnp.where(oki, ids_c, 0).astype(jnp.int32)[None, :]

    return (
        jnp.concatenate([P_off, P_dia], axis=0)[None],
        jnp.concatenate([Pc_off, Pc_dia], axis=0)[None],
    )


# ----------------------------------------------------------------------
# stage C: AP with halo-exchanged P rows
# ----------------------------------------------------------------------

def _ap_shard(data, cols, P_data, P_cols, offs, cnt, *, H, kap, nlocp,
              axis):
    data, cols = data[0], cols[0]
    P_data, P_cols = P_data[0], P_cols[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    valid = (data != 0) & alive[None, :]

    P_ext_d = _exchange_last(P_data, H, axis)
    P_ext_c = _exchange_last(P_cols, H, axis)
    pc = _pidx(cols, offs, nlocp)
    wid = (2 * H + 1) * nlocp
    jw = jnp.clip(pc - (my - H) * nlocp, 0, wid - 1)
    jw = jnp.where(valid, jw, 0)
    d, c, kmax, _ = spgemm_ap_device(
        jnp.where(valid, data, 0.0), jw, P_ext_d, P_ext_c, kap
    )
    return d[None], c[None], kmax[None]


# ----------------------------------------------------------------------
# stage D: compress terms into owner shards' coarse rows
# ----------------------------------------------------------------------

def _coarse_compress(rowc, colc, val, coffs, *, ncp, kb, W, axis):
    """Flat (coarse row, col, val) terms -> this shard's coarse-row ELL.

    Terms may target coarse rows up to W shards away; they are
    compressed into a (2W+1)*ncp window, the 2W overlap slabs ppermute
    to their owners, and a small merge sort sums them in.  Returns
    (data, cols, kmax, nnz, n_misrouted) — a positive misroute count
    means W was too small and the caller must retry with a wider
    window."""
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    ndev = jax.lax.axis_size(axis)
    nwin = (2 * W + 1) * ncp
    cp = _pidx(rowc, coffs, ncp)
    win = cp - (my - W) * ncp
    bad = ((win < 0) | (win >= nwin)) & (val != 0)
    n_bad = jnp.sum(bad.astype(jnp.int32))
    win = jnp.clip(win, 0, nwin - 1)
    d, c, kmax_w, _ = _terms_to_ell(win, colc, val, nwin, kb)

    parts = [(d[:, W * ncp:(W + 1) * ncp], c[:, W * ncp:(W + 1) * ncp])]
    for h in range(1, W + 1):
        # my slab (W-h) holds rows of shard my-h -> ship h to the left
        sl = slice((W - h) * ncp, (W - h + 1) * ncp)
        perm = _shift_perm(ndev, -h)
        parts.append((jax.lax.ppermute(d[:, sl], axis, perm),
                      jax.lax.ppermute(c[:, sl], axis, perm)))
        # my slab (W+h) holds rows of shard my+h -> ship h to the right
        sr = slice((W + h) * ncp, (W + h + 1) * ncp)
        perm = _shift_perm(ndev, h)
        parts.append((jax.lax.ppermute(d[:, sr], axis, perm),
                      jax.lax.ppermute(c[:, sr], axis, perm)))
    md, mc, kmax, nnz = _merge_partial_ell(parts, ncp, kb)
    # a window-stage overflow silently drops entries even when the
    # merged width fits — surface the larger of the two
    return md, mc, jnp.maximum(kmax, kmax_w), nnz, n_bad


def _rap_shard(P_data, P_cols, AP_d, AP_c, coffs, *, ncp, kc, Wh, axis):
    P_data, P_cols, AP_d, AP_c = P_data[0], P_cols[0], AP_d[0], AP_c[0]
    T = P_data[:, None, :] * AP_d[None, :, :]
    a = jnp.broadcast_to(P_cols[:, None, :], T.shape)
    b = jnp.broadcast_to(AP_c[None, :, :], T.shape)
    d, c, kmax, nnz, bad = _coarse_compress(
        a.reshape(-1), b.reshape(-1), T.reshape(-1), coffs,
        ncp=ncp, kb=kc, W=Wh, axis=axis,
    )
    return d[None], c[None], kmax[None], nnz[None], bad[None]


def _transpose_shard(P_data, P_cols, coffs, offs_fine, cnt_fine, *,
                     ncp, kr, nlocp, Wh, axis):
    P_data, P_cols = P_data[0], P_cols[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    gidx = offs_fine[my] + li
    rows = jnp.broadcast_to(gidx[None, :], P_cols.shape)
    d, c, kmax, nnz, bad = _coarse_compress(
        P_cols.reshape(-1), rows.reshape(-1), P_data.reshape(-1), coffs,
        ncp=ncp, kb=kr, W=Wh, axis=axis,
    )
    return d[None], c[None], kmax[None], nnz[None], bad[None]


# ----------------------------------------------------------------------
# relaxation state (row-local)
# ----------------------------------------------------------------------

def _relax_shard(data, cols, offs, cnt, *, relaxation, nlocp, axis):
    from ..relaxation.spai0 import SPAI0, SPAI0State
    from ..relaxation.damped_jacobi import DampedJacobi, JacobiState
    from ..relaxation.chebyshev import Chebyshev, ChebyshevState

    data, cols = data[0], cols[0]
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    li = jnp.arange(nlocp, dtype=jnp.int32)
    alive = li < cnt[my]
    gidx = offs[my] + li
    valid = (data != 0) & alive[None, :]
    dia = jnp.sum(jnp.where((cols == gidx[None, :]) & valid, data, 0.0),
                  axis=0)
    if isinstance(relaxation, SPAI0):
        row_sq = jnp.sum(jnp.where(valid, data * data, 0.0), axis=0)
        m = jnp.where(
            row_sq > 0, dia / jnp.where(row_sq == 0, 1.0, row_sq), 1.0
        )
        return SPAI0State(m=jnp.where(alive, m, 0.0)[None])
    if isinstance(relaxation, DampedJacobi):
        inv = jnp.where(dia != 0, 1.0 / jnp.where(dia == 0, 1.0, dia),
                        1.0)
        return JacobiState(
            inv_dia=jnp.where(alive, inv, 0.0)[None],
            damping=jnp.full((1, 1), relaxation.damping, data.dtype),
        )
    if isinstance(relaxation, Chebyshev):
        # spectral radius by the distributed Gershgorin bound: local max
        # abs row sum (of D^{-1}A when scale) + one pmax — the sharded
        # mirror of the serial setup's bound (mpi spectral_radius role,
        # mpi/distributed_matrix.hpp:1109).
        absrow = jnp.sum(jnp.abs(jnp.where(valid, data, 0.0)), axis=0)
        inv = jnp.where(dia != 0, 1.0 / jnp.where(dia == 0, 1.0, dia),
                        1.0)
        if relaxation.scale:
            absrow = absrow * jnp.abs(inv)
        rho = jax.lax.pmax(
            jnp.max(jnp.where(alive, absrow, 0.0)), axis
        )
        lo = rho * relaxation.lower
        hi = rho * relaxation.higher
        return ChebyshevState(
            c=jnp.full((1, 1), 0.0, data.dtype) + 0.5 * (hi - lo),
            d=jnp.full((1, 1), 0.0, data.dtype) + 0.5 * (hi + lo),
            inv_dia=(
                jnp.where(alive, inv, 0.0)[None] if relaxation.scale
                else jnp.ones((1, 1), data.dtype)
            ),
            degree=relaxation.degree,
            scale=relaxation.scale,
        )
    raise ValueError(
        "sharded general setup supports SPAI0/DampedJacobi/Chebyshev "
        "device smoothing (plus local-block ILU0 at the finest level "
        f"via from_parts); got {type(relaxation).__name__}"
    )


def _stack_local_ilu(parts, offs, nlocp, relaxation, dtype):
    """Per-shard local-diagonal-block ILU(0) states stacked for shard_map
    — the reference's MPI relaxation model (each rank re-instantiates the
    smoother on its local block, amgcl/mpi/relaxation/*.hpp): ILU between
    shards degrades to block-Jacobi, exactly as there.  Factors hold
    LOCAL column ids, so the triangular solves never leave the shard."""
    from ..ops.formats import SparseMatrix
    from ..relaxation.ilu0 import ILU0, ILUState, ilu0_factor_host
    from ..relaxation.ilu0_chow_patel import (
        ILU0ChowPatel, chow_patel_factor_host,
    )

    per = []
    for s, p in enumerate(parts):
        n_s = p.shape[0]
        if n_s == 0:
            per.append((None, None, np.zeros(0)))
            continue
        A_loc = sp.csr_matrix(p[:, offs[s]:offs[s] + n_s])
        A_loc.sort_indices()
        if isinstance(relaxation, ILU0ChowPatel):
            L, U_strict, inv = chow_patel_factor_host(
                A_loc, relaxation.sweeps
            )
        else:
            L, U = ilu0_factor_host(A_loc)
            d = U.diagonal()
            U_strict = sp.triu(U, k=1, format="csr")
            inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
        per.append((sp.csr_matrix(L), sp.csr_matrix(U_strict), inv))

    def width(M):
        return int(np.diff(M.indptr).max(initial=0)) if M is not None else 0

    KL = _round8(max(max((width(L) for L, _, _ in per), default=1), 1))
    KU = _round8(max(max((width(U) for _, U, _ in per), default=1), 1))

    def ell(M, K):
        d = np.zeros((K, nlocp))
        c = np.zeros((K, nlocp), np.int32)
        if M is not None and M.nnz:
            cnt_r = np.diff(M.indptr)
            r = np.repeat(np.arange(M.shape[0]), cnt_r)
            o = np.arange(M.nnz) - np.repeat(M.indptr[:-1], cnt_r)
            d[o, r] = M.data
            c[o, r] = M.indices
        return d, c

    Ld, Lc, Ud, Uc, iv = [], [], [], [], []
    for L, U, inv in per:
        dL, cL = ell(L, KL)
        dU, cU = ell(U, KU)
        Ld.append(dL); Lc.append(cL); Ud.append(dU); Uc.append(cU)
        iv.append(np.pad(inv, (0, nlocp - len(inv))))
    S = len(parts)
    nnz = max(int(sum(L.nnz for L, _, _ in per if L is not None)), 1)

    def mat(d, c, nnz_):
        return SparseMatrix(
            data=jnp.asarray(np.stack(d), dtype=dtype)[:, :, None, None, :],
            cols=jnp.asarray(np.stack(c)),
            shape=(nlocp, nlocp), block=1, nnz=nnz_,
        )

    return ILUState(
        L=mat(Ld, Lc, nnz),
        U=mat(Ud, Uc, nnz),
        inv_dia=jnp.asarray(np.stack(iv), dtype=dtype),
        damping=jnp.full((S, 1), relaxation.damping, dtype),
        jacobi_iters=relaxation.jacobi_iters,
        block=1,
    )


# ----------------------------------------------------------------------
# level wrapping (padded global ids for the solve phase)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nlocp", "ncp"))
def _to_padded_cols(A_c, P_c, R_c, offs, coffs, nlocp, ncp):
    """Convert compact global column ids to padded-layout ids (what the
    tiled all_gather of per-shard slabs indexes)."""
    def conv(c, o, w):
        return jax.vmap(lambda cc: _pidx(cc, o, w))(c)
    return (
        conv(A_c, offs, nlocp),
        conv(P_c, coffs, ncp),
        conv(R_c, offs, nlocp),
    )


def _wrap_level(data, cols, P_d, P_c, R_d, R_c, relax,
                offs, coffs, nlocp, ncp, S, axis, nc_true):
    """Stacked per-shard arrays -> a DistGenLevel (DistEll metas with
    padded global column ids)."""
    A_cp, P_cp, R_cp = _to_padded_cols(cols, P_c, R_c, offs, coffs,
                                       nlocp, ncp)
    KA = data.shape[1]
    KP = P_d.shape[1]
    KR = R_d.shape[1]
    A_arrs = (data[:, :, None, None, :], A_cp)
    P_arrs = (P_d[:, :, None, None, :], P_cp)
    R_arrs = (R_d[:, :, None, None, :], R_cp)
    return DistGenLevel(
        A_arrs=A_arrs, P_arrs=P_arrs, R_arrs=R_arrs, relax=relax,
        A_meta=("ell", S * nlocp, nlocp, 1),
        P_meta=("ell", S * ncp, nlocp, 1),
        R_meta=("ell", S * nlocp, ncp, 1),
        axis=axis, nc_pad=S * ncp, nc_true=nc_true,
    )


# ----------------------------------------------------------------------
# cycle with a permuted (padded-layout) tail
# ----------------------------------------------------------------------

def _cycle_padded(dist_levels, tail, tail_idx, i, rhs, prm, axis):
    """The dist_general V-cycle, except the consolidated tail's compact
    indexing is reached through ``tail_idx`` (padded-layout positions of
    compact tail rows) instead of a contiguous prefix."""
    from .dist_general import _mk_local, _unstack
    from .dist_amg import _relax_apply
    from .dist import dist_spmv
    from ..precond.amg import _cycle as serial_cycle

    if i == len(dist_levels):
        r_full = jax.lax.all_gather(rhs, axis, tiled=True)
        r_comp = r_full[tail_idx]
        x_comp = serial_cycle(tail, 0, r_comp, prm)
        x_full = jnp.zeros_like(r_full).at[tail_idx].set(x_comp)
        n_loc = rhs.shape[0]
        my = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice(x_full, (my * n_loc,), (n_loc,))

    lvl = dist_levels[i]
    A = _mk_local(tuple(a[0] for a in lvl.A_arrs), lvl.A_meta, axis)
    Pm = _mk_local(tuple(a[0] for a in lvl.P_arrs), lvl.P_meta, axis)
    Rm = _mk_local(tuple(a[0] for a in lvl.R_arrs), lvl.R_meta, axis)
    relax = _unstack(lvl.relax)
    x = None                    # zero guess: first sweep skips A @ 0
    for _ in range(prm.ncycle):
        for _ in range(prm.npre):
            x = _relax_apply(relax, A, rhs, x)
        if x is None:
            x = jnp.zeros_like(rhs)
        t = rhs - dist_spmv(A, x)
        rc = dist_spmv(Rm, t)
        xc = _cycle_padded(dist_levels, tail, tail_idx, i + 1, rc, prm,
                           axis)
        x = x + dist_spmv(Pm, xc)
        for _ in range(prm.npost):
            x = _relax_apply(relax, A, rhs, x)
    return x


# ----------------------------------------------------------------------
# driver
# ----------------------------------------------------------------------

@dataclasses.dataclass
class ShardedGeneralAMG:
    """General-matrix AMG whose *setup* runs sharded over a device mesh —
    the SPMD analogue of mpi::amg with distributed PMIS coarsening and
    distributed Galerkin products (amgcl/mpi/amg.hpp:56,
    mpi/coarsening/pmis.hpp:50, mpi/distributed_matrix.hpp:858-1066).

    Construction: ``ShardedGeneralAMG.from_parts([A_shard0_rows, ...])``
    — each shard contributes its row block with global column indices;
    no participant ever assembles the global matrix.  ``from_global`` is
    a test convenience that splits a host matrix first."""

    dist_levels: tuple          # DistGenLevel pytrees (stacked arrays)
    tail: tuple                 # replicated serial Level tuple
    tail_idx: np.ndarray        # compact tail row -> padded position
    l0_idx: np.ndarray          # compact fine row -> padded position
    prm: AMGParams
    mesh: Mesh
    axis: str
    n0: int                     # true global fine size
    nlocp0: int                 # padded fine rows per shard
    setup_stats: dict
    # input-precision L0 ((arrs, meta)) for the outer Krylov A·p; None
    # when the hierarchy dtype already equals the input dtype
    A0_hi: tuple | None = None

    # -- construction ---------------------------------------------------

    @staticmethod
    def from_parts(parts, *, mesh=None, axis="shard", relaxation=None,
                   params=None, eps_strong=0.08, relax_factor=1.0,
                   seed=42, dtype=jnp.float32, min_loc=64,
                   block_size=1):
        S = len(parts)
        if mesh is None:
            devs = jax.devices()
            if len(devs) < S:
                raise ValueError(f"need {S} devices, have {len(devs)}")
            mesh = Mesh(np.array(devs[:S]), (axis,))
        parts = [sp.csr_matrix(p) for p in parts]
        if block_size > 1:
            for s, p in enumerate(parts):
                if p.shape[0] % block_size:
                    raise ValueError(
                        f"shard {s} has {p.shape[0]} rows — the row "
                        f"partition must align to block_size="
                        f"{block_size} boundaries"
                    )
        counts = np.array([p.shape[0] for p in parts], dtype=np.int32)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int32
        )
        n_true = int(counts.sum())
        nlocp = max(int(counts.max()), 1)
        if block_size > 1:
            nlocp = -(-nlocp // block_size) * block_size
        K = max(
            max((int(np.diff(p.indptr).max(initial=0)) for p in parts),
                default=1), 1)
        K = _round8(K)
        data = np.zeros((S, K, nlocp), dtype=np.float64)
        cols = np.zeros((S, K, nlocp), dtype=np.int32)
        for s, p in enumerate(parts):
            p.sort_indices()
            cnt_r = np.diff(p.indptr)
            r = np.repeat(np.arange(p.shape[0]), cnt_r)
            o = np.arange(p.nnz) - np.repeat(p.indptr[:-1], cnt_r)
            data[s, o, r] = p.data
            cols[s, o, r] = p.indices
        relaxation = relaxation or rlx.SPAI0()
        l0_relax = None
        if isinstance(relaxation, (rlx.ILU0, rlx.ILU0ChowPatel)):
            # Local-block ILU0 at the finest level (host factorization of
            # each shard's diagonal block — the reference's MPI model);
            # coarser levels smooth with SPAI0 (their operators exist only
            # on device, and ILU's sequential factorization would force
            # an nnz-sized device→host pull).
            l0_relax = _stack_local_ilu(parts, offs, nlocp, relaxation,
                                        dtype)
            relaxation = rlx.SPAI0()
        return ShardedGeneralAMG._build(
            jnp.asarray(data, dtype=dtype), jnp.asarray(cols),
            jnp.asarray(offs), jnp.asarray(counts), n_true, mesh, axis,
            relaxation, params or AMGParams(),
            eps_strong, relax_factor, seed, dtype, min_loc,
            data_hi=jnp.asarray(data),   # input-precision L0 (outer op)
            l0_relax=l0_relax, block=block_size,
        )

    @staticmethod
    def from_global(A, S, **kw):
        """Test convenience: split a host matrix into S row slabs
        (aligned to block_size boundaries when given)."""
        A = sp.csr_matrix(A)
        n = A.shape[0]
        b = kw.get("block_size", 1)
        size = -(-n // S)
        if b > 1:
            size = -(-size // b) * b
        parts = [A[i:min(i + size, n)] for i in range(0, n, size)]
        while len(parts) < S:
            parts.append(sp.csr_matrix((0, n)))
        return ShardedGeneralAMG.from_parts(parts, **kw)

    @staticmethod
    def _build(data, cols, offs, cnt, n_true, mesh, axis, relaxation,
               prm, eps_strong, relax_factor, seed, dtype, min_loc,
               data_hi=None, l0_relax=None, block=1):
        S = mesh.shape[axis]
        stats = {"retries": 0, "levels": []}
        sm = partial(jax.shard_map, mesh=mesh, check_vma=False)
        Pa, Pr = P(axis), P()        # sharded / replicated

        # Input-precision level-0 operator for the outer Krylov loop: the
        # f32 hierarchy is the preconditioner, but a CG whose A·p runs on
        # the rounded f32 operator stalls its TRUE residual near the f32
        # floor while the recurrence happily reports 1e-9.
        A0_hi = None
        if data_hi is not None and data_hi.dtype != data.dtype:
            c_pad0 = jax.jit(
                jax.vmap(jax.vmap(jax.vmap(
                    lambda c: _pidx(c, offs, data.shape[2])
                )))
            )(cols)
            A0_hi = (
                (data_hi[:, :, None, None, :], c_pad0),
                ("ell", S * data.shape[2], data.shape[2], 1),
            )

        n0 = n_true
        dist_levels = []
        eps = eps_strong
        nlocp = data.shape[2]
        nlocp0 = nlocp
        l0_cnt = np.asarray(cnt).copy()
        tail_n = max(prm.coarse_enough, S * min_loc)

        while (
            len(dist_levels) < prm.max_levels - 1
            and n_true > tail_n
        ):
            K = data.shape[1]
            omega = relax_factor * 2.0 / 3.0

            # measured column reach -> static whole-slab window width
            # for every neighbour exchange of this level (the
            # comm_pattern dual: traffic O(W·n/S + halo), not O(n))
            reach = jax.jit(sm(
                partial(_reach_shard, nlocp=nlocp, axis=axis),
                in_specs=(Pa, Pa, Pr, Pr), out_specs=Pa,
            ))(data, cols, offs, cnt)
            Hrows = int(np.asarray(reach).max())
            H = min(-(-Hrows // nlocp), S - 1) if Hrows > 0 else 0

            if block > 1:
                # block path: strength + PMIS run on the per-shard
                # condensed block-Frobenius graph (the reference's MPI
                # pointwise compression, mpi/coarsening/pmis.hpp:50);
                # ids and strength expand back to the scalar planes so
                # prolongation/RAP run unchanged.
                from ..coarsening.device_setup import expand_block_ids

                nlocb = nlocp // block
                offs_b = offs // block
                cnt_b = cnt // block
                kb = _round8(max(K, 8))
                while True:
                    cond_ = jax.jit(sm(
                        partial(_condense_shard, b=block, kb=kb,
                                nlocp=nlocp, axis=axis),
                        in_specs=(Pa, Pa, Pr),
                        out_specs=(Pa, Pa, Pa),
                    ))
                    Cd, Cc, kmax_b = cond_(data, cols, cnt)
                    km = int(np.asarray(kmax_b).max())
                    if km <= kb:
                        break
                    stats["retries"] += 1
                    kb = _round8(km)

                reach_b = jax.jit(sm(
                    partial(_reach_shard, nlocp=nlocb, axis=axis),
                    in_specs=(Pa, Pa, Pr, Pr), out_specs=Pa,
                ))(Cd, Cc, offs_b, cnt_b)
                Hb_rows = int(np.asarray(reach_b).max())
                Hb = (min(-(-Hb_rows // nlocb), S - 1)
                      if Hb_rows > 0 else 0)

                pmis = jax.jit(sm(
                    partial(_pmis_shard, nlocp=nlocb, S=S, axis=axis,
                            W=Hb),
                    in_specs=(Pa, Pa, Pr, Pr, Pr, Pr),
                    out_specs=(Pa, Pa, Pa, Pa),
                ))
                ids_b, counts_b, strong_b, _hb = pmis(
                    Cd, Cc, offs_b, cnt_b,
                    jnp.asarray(eps * eps, Cd.dtype),
                    jnp.asarray(seed, jnp.int32),
                )
                counts_np = np.asarray(counts_b).reshape(-1) * block
                nc_true = int(counts_np.sum())
                if nc_true == 0:
                    raise RuntimeError(
                        "sharded PMIS formed no aggregates"
                    )
                if nc_true >= n_true:
                    break
                ncp = max(int(counts_np.max()), block)

                ids_c = jax.jit(jax.vmap(
                    partial(expand_block_ids, b=block)
                ))(ids_b)
                bstr = jax.jit(sm(
                    partial(_block_strong_shard, b=block, nlocp=nlocp,
                            axis=axis),
                    in_specs=(Pa, Pa, Pa, Pa, Pr, Pr),
                    out_specs=Pa,
                ))
                strong = bstr(data, cols, Cc, strong_b, offs, cnt)
            else:
                pmis = jax.jit(sm(
                    partial(_pmis_shard, nlocp=nlocp, S=S, axis=axis,
                            W=H),
                    in_specs=(Pa, Pa, Pr, Pr, Pr, Pr),
                    out_specs=(Pa, Pa, Pa, Pa),
                ))
                ids_c, counts_c, strong, halo = pmis(
                    data, cols, offs, cnt,
                    jnp.asarray(eps * eps, data.dtype),
                    jnp.asarray(seed, jnp.int32),
                )
                counts_np = np.asarray(counts_c).reshape(-1)
                nc_true = int(counts_np.sum())
                if nc_true == 0:
                    raise RuntimeError(
                        "sharded PMIS formed no aggregates"
                    )
                if nc_true >= n_true:
                    break
                ncp = max(int(counts_np.max()), 1)

            prol = jax.jit(sm(
                partial(_prolong_shard, nlocp=nlocp, axis=axis, W=H),
                in_specs=(Pa, Pa, Pa, Pa, Pr, Pr, Pr),
                out_specs=(Pa, Pa),
            ))
            P_d, P_c = prol(
                data, cols, ids_c, strong, offs, cnt,
                jnp.asarray(omega, data.dtype),
            )
            kap = _round8(K + 8)
            while True:
                ap = jax.jit(sm(
                    partial(_ap_shard, H=H, kap=kap, nlocp=nlocp,
                            axis=axis),
                    in_specs=(Pa, Pa, Pa, Pa, Pr, Pr),
                    out_specs=(Pa, Pa, Pa),
                ))
                AP_d, AP_c, kmax = ap(data, cols, P_d, P_c, offs, cnt)
                km = int(np.asarray(kmax).max())
                if km <= kap:
                    break
                stats["retries"] += 1
                kap = _round8(km)

            coffs_np = np.concatenate(
                [[0], np.cumsum(counts_np)[:-1]]
            ).astype(np.int32)
            coffs = jnp.asarray(coffs_np)
            ccnt = jnp.asarray(counts_np.astype(np.int32))

            kc = _round8(4 * K)
            Wh = 1
            while True:
                rap = jax.jit(sm(
                    partial(_rap_shard, ncp=ncp, kc=kc, Wh=Wh,
                            axis=axis),
                    in_specs=(Pa, Pa, Pa, Pa, Pr),
                    out_specs=(Pa, Pa, Pa, Pa, Pa),
                ))
                Ac_d, Ac_c, kmax_c, nnz_c, bad = rap(
                    P_d, P_c, AP_d, AP_c, coffs
                )
                if int(np.asarray(bad).max()) > 0 and Wh < S - 1:
                    stats["retries"] += 1
                    Wh += 1
                    continue
                km = int(np.asarray(kmax_c).max())
                if km <= kc:
                    break
                stats["retries"] += 1
                kc = _round8(km)

            kr = _round8(3 * (K + 1))
            Wr = 1
            while True:
                tr = jax.jit(sm(
                    partial(_transpose_shard, ncp=ncp, kr=kr,
                            nlocp=nlocp, Wh=Wr, axis=axis),
                    in_specs=(Pa, Pa, Pr, Pr, Pr),
                    out_specs=(Pa, Pa, Pa, Pa, Pa),
                ))
                R_d, R_c, kmax_r, nnz_r, bad_r = tr(
                    P_d, P_c, coffs, offs, cnt
                )
                if int(np.asarray(bad_r).max()) > 0 and Wr < S - 1:
                    stats["retries"] += 1
                    Wr += 1
                    continue
                km = int(np.asarray(kmax_r).max())
                if km <= kr:
                    break
                stats["retries"] += 1
                kr = _round8(km)

            if l0_relax is not None and not dist_levels:
                relax = l0_relax       # prebuilt local-block ILU0 states
            else:
                rx = jax.jit(sm(
                    partial(_relax_shard, relaxation=relaxation,
                            nlocp=nlocp, axis=axis),
                    in_specs=(Pa, Pa, Pr, Pr),
                    out_specs=Pa,
                ))
                relax = rx(data, cols, offs, cnt)

            dist_levels.append(_wrap_level(
                data, cols, P_d, P_c, R_d, R_c, relax,
                offs, coffs, nlocp, ncp, S, axis, nc_true,
            ))
            stats["levels"].append(
                {"n": n_true, "nc": nc_true, "K": K, "halo": H}
            )

            data, cols = Ac_d, Ac_c
            offs, cnt = coffs, ccnt
            nlocp = ncp
            n_true = nc_true
            eps *= 0.5

        # consolidated replicated tail: concatenate the (small) compact
        # level and continue with the serial device builder
        from ..precond.ell_setup import build_ell_hierarchy
        from ..precond.ell_setup import _wrap as wrap_serial

        cnt_np = np.asarray(cnt)
        d_parts = [data[s, :, : int(cnt_np[s])] for s in range(S)
                   if int(cnt_np[s])]
        c_parts = [cols[s, :, : int(cnt_np[s])] for s in range(S)
                   if int(cnt_np[s])]
        A_comp = wrap_serial(
            jnp.concatenate(d_parts, axis=1),
            jnp.concatenate(c_parts, axis=1),
            (n_true, n_true), 0,
        )
        tail_prm = dataclasses.replace(
            prm,
            max_levels=max(prm.max_levels - len(dist_levels), 1),
        )
        tail, _ = build_ell_hierarchy(
            A_comp, params=tail_prm, relaxation=relaxation,
            eps_strong=eps, relax_factor=relax_factor, seed=seed,
            dtype=dtype, block=block,
        )

        tail_idx = np.concatenate([
            s * nlocp + np.arange(int(cnt_np[s])) for s in range(S)
        ]).astype(np.int32)
        l0_idx = np.concatenate([
            s * nlocp0 + np.arange(int(l0_cnt[s])) for s in range(S)
        ]).astype(np.int32)

        return ShardedGeneralAMG(
            dist_levels=tuple(dist_levels), tail=tail,
            tail_idx=tail_idx, l0_idx=l0_idx, prm=prm, mesh=mesh,
            axis=axis, n0=n0, nlocp0=nlocp0, setup_stats=stats,
            A0_hi=A0_hi,
        )

    # -- solve ----------------------------------------------------------

    def make_solver(self, tol=1e-8, maxiter=200):
        """A jitted sharded PCG over the mesh (psum dots, the padded-tail
        distributed V-cycle as preconditioner).  Returns
        ``run(b) -> (x, iters, rel_res)`` taking/returning compact
        host-ordered vectors."""
        from .dist_general import _mk_local
        from .dist import dist_spmv

        axis = self.axis
        prm = self.prm
        tail_idx = jnp.asarray(self.tail_idx)
        nlocp = self.nlocp0
        S = self.mesh.shape[axis]
        dist_levels = self.dist_levels
        tail = self.tail
        A0_hi = self.A0_hi
        hi_arrs = A0_hi[0] if A0_hi is not None else None
        hi_meta = A0_hi[1] if A0_hi is not None else None

        def shard_solve(levels, hi, tailv, tidx, b_loc):
            b_loc = b_loc.reshape(-1)
            if hi is not None:
                A0 = _mk_local(tuple(a[0] for a in hi), hi_meta, axis)
                Aop = lambda x: dist_spmv(A0, x)
            elif levels:
                A0 = _mk_local(
                    tuple(a[0] for a in levels[0].A_arrs),
                    levels[0].A_meta, axis,
                )
                Aop = lambda x: dist_spmv(A0, x)
            else:
                raise ValueError(
                    "the whole matrix fits the replicated coarse tail "
                    "(rows <= coarse_enough) — nothing to shard; lower "
                    "params.coarse_enough or solve serially"
                )
            if not levels:
                raise ValueError(
                    "the whole matrix fits the replicated coarse tail "
                    "(rows <= coarse_enough) — nothing to shard; lower "
                    "params.coarse_enough or solve serially"
                )

            dt = b_loc.dtype

            def Pop(r):
                pdt = jax.tree_util.tree_leaves(levels[0].A_arrs)[0].dtype
                x = _cycle_padded(
                    levels, tailv, tidx, 0, r.astype(pdt), prm, axis
                )
                return x.astype(dt)

            def dot(u, v):
                return jax.lax.psum(jnp.sum(u * v), axis)

            norm_b = jnp.sqrt(dot(b_loc, b_loc))
            eps_ = jnp.maximum(tol * norm_b, 1e-30)
            x = jnp.zeros_like(b_loc)
            r = b_loc
            res0 = norm_b
            one = jnp.asarray(1.0, dt)

            def cond(st):
                x, r, p, rho_prev, it, res = st
                return (it < maxiter) & (res > eps_)

            def body(st):
                x, r, p, rho_prev, it, res = st
                s = Pop(r)
                rho = dot(r, s)
                beta = jnp.where(
                    it == 0, jnp.zeros_like(rho), rho / rho_prev
                )
                p = s + beta * p
                q = Aop(p)
                alpha = rho / dot(q, p)
                x = x + alpha * p
                r = r - alpha * q
                return x, r, p, rho, it + 1, jnp.sqrt(dot(r, r))

            st = jax.lax.while_loop(
                cond, body,
                (x, r, jnp.zeros_like(b_loc), one,
                 jnp.asarray(0, jnp.int32), res0),
            )
            x, r, p, rho, it, res = st
            return x[None], it[None], (res / norm_b)[None]

        Pa, Pr = P(axis), P()
        lv_spec = jax.tree_util.tree_map(lambda _: Pa, dist_levels)
        tail_spec = jax.tree_util.tree_map(lambda _: Pr, tail)
        hi_spec = jax.tree_util.tree_map(lambda _: Pa, hi_arrs)
        solve = jax.jit(jax.shard_map(
            shard_solve, mesh=self.mesh,
            in_specs=(lv_spec, hi_spec, tail_spec, Pr, Pa),
            out_specs=(Pa, Pa, Pa),
            check_vma=False,
        ))
        l0_idx = self.l0_idx

        def run(b):
            b = np.asarray(b)
            bp = np.zeros(S * nlocp, dtype=b.dtype)
            bp[l0_idx] = b
            bp = bp.reshape(S, nlocp)
            x_p, iters, res = solve(
                dist_levels, hi_arrs, tail, tail_idx, jnp.asarray(bp)
            )
            x = np.asarray(x_p).reshape(-1)[l0_idx]

            return x, int(np.asarray(iters).max()), float(
                np.asarray(res).max()
            )

        return run

    def level0_compact(self):
        """Gather level-0 A back to a compact scipy matrix (testing)."""
        if self.dist_levels:
            lvl = self.dist_levels[0]
            data = np.asarray(lvl.A_arrs[0])[:, :, 0, 0, :]
            cols = np.asarray(lvl.A_arrs[1])
        else:
            raise AssertionError("no sharded levels")
        S, K, nlocp = data.shape
        rows_pad = np.arange(S * nlocp)
        d = data.transpose(1, 0, 2).reshape(K, -1)
        c = cols.transpose(1, 0, 2).reshape(K, -1)
        inv = -np.ones(S * nlocp, dtype=np.int64)
        inv[self.l0_idx] = np.arange(self.n0)
        r = np.broadcast_to(rows_pad[None, :], d.shape)
        mask = d != 0
        rr = inv[r[mask]]
        cc = inv[c[mask]]
        return sp.coo_matrix(
            (d[mask], (rr, cc)), shape=(self.n0, self.n0)
        ).tocsr()
