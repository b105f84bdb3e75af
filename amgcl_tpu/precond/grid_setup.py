"""Device-side AMG setup for structured (grid) problems.

The reference always builds its hierarchy on the CPU
(amgcl/amg.hpp:355-360).  This module builds it **on the TPU**:

* the prolongation smoother S = I − ω D_F⁻¹ A_F is computed directly from
  the level's DIA data with vector ops (strength filter included);
* the Galerkin product Ac = R A P is recovered by *stencil probing*: the
  composite operator M = Down∘Sᵀ∘A∘S∘Up is applied to lattice-colored
  indicator vectors (distance coloring of the coarse grid); one batched
  application per level yields every coarse diagonal exactly — no sparse
  matrix–matrix product anywhere;
* smoother states (SPAI0 / damped Jacobi / Chebyshev) come from the DIA
  data on device;
* the coarsest level is densified and inverted on device.

The only host↔device traffic is the initial fine-matrix upload.
Correctness is exact (tested against the scipy Galerkin path): probing is
an identity for operators whose stencil fits the coloring distance, which
holds by construction (reach(M) = reach(A) + 2·reach(S) in fine cells).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.formats import DiaMatrix
from ..ops.spmv import spmv
from ..coarsening.grid_aggregation import GridTransfer
from .amg import Level, AMGParams
from .. import relaxation as rlx


# ----------------------------------------------------------------------
# offset geometry
# ----------------------------------------------------------------------

def decompose_offsets(offsets, dims):
    """Flat diagonal offsets → per-dim components (minimal-magnitude mixed
    radix).  Valid while every |component| < dim/2."""
    strides = []
    s = 1
    for d in reversed(dims):
        strides.append(s)
        s *= d
    strides = strides[::-1]
    out = []
    for off in offsets:
        rem = off
        comp = []
        for st, dim in zip(strides, dims):
            c = round(rem / st)
            # pull c into the representable range
            c = max(-(dim - 1), min(dim - 1, c))
            rem2 = rem - c * st
            # adjust until the remainder is representable by later dims
            limit = (st - 1)
            while rem2 > limit:
                c += 1
                rem2 = rem - c * st
            while rem2 < -limit:
                c -= 1
                rem2 = rem - c * st
            comp.append(c)
            rem = rem2
        if rem != 0:
            raise ValueError(f"offset {off} not decomposable on dims {dims}")
        out.append(tuple(comp))
    return out


def reach(offsets, dims):
    comps = decompose_offsets(offsets, dims)
    return tuple(max(abs(c[i]) for c in comps) for i in range(len(dims)))


# ----------------------------------------------------------------------
# device smoother from DIA data
# ----------------------------------------------------------------------

def dia_filtered_smoother(A: DiaMatrix, omega: float, eps_strong: float):
    """S = I − ω D_F⁻¹ A_F computed from DIA data on device (the exact
    semantics of coarsening/smoothed_aggregation.py::filtered_smoother)."""
    n = A.shape[0]
    if 0 not in A.offsets:
        raise ValueError("matrix has no diagonal")
    dia = A.data[A.offsets.index(0)]
    eps2 = eps_strong * eps_strong

    # shifted diagonal values dia_{i+d} (zero out of range → weak)
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    dia_p = jnp.pad(dia, (L, R))

    strong_rows = []
    for k, d in enumerate(A.offsets):
        if d == 0:
            strong_rows.append(jnp.zeros(n, dtype=bool))
            continue
        dia_d = jax.lax.slice(dia_p, (L + d,), (L + d + n,))
        v = A.data[k]
        strong_rows.append(eps2 * dia * dia_d < v * v)
    strong = jnp.stack(strong_rows)          # (D, n)

    # dia_F = a_ii + Σ weak offdiagonals; the diagonal row has strong=False
    # so the masked sum includes a_ii itself.
    dia_F = jnp.sum(jnp.where(strong, 0.0, A.data), axis=0)
    inv_dF = jnp.where(dia_F != 0, 1.0 / jnp.where(dia_F == 0, 1.0, dia_F), 0.0)

    S_rows = []
    for k, d in enumerate(A.offsets):
        if d == 0:
            S_rows.append(jnp.full(n, 1.0 - omega, dtype=A.dtype))
        else:
            S_rows.append(
                jnp.where(strong[k], -omega * inv_dF * A.data[k], 0.0)
            )
    return DiaMatrix(
        data=jnp.stack(S_rows), offsets=A.offsets, shape=A.shape, nnz=A.nnz
    )


# ----------------------------------------------------------------------
# Galerkin by probing
# ----------------------------------------------------------------------

def _color_field(cdims, strides, dtype):
    """color index per coarse node: mixed-radix of (x_i mod stride_i)."""
    grids = jnp.meshgrid(
        *[jnp.arange(d) % s for d, s in zip(cdims, strides)], indexing="ij"
    )
    cid = jnp.zeros(cdims, dtype=jnp.int32)
    for g, s in zip(grids, strides):
        cid = cid * s + g.astype(jnp.int32)
    return cid.reshape(-1)


def _extract_from_probes(Wh: np.ndarray, cdims, creach):
    """Host-side extraction of the DIA diagonals from the probe responses
    W (ncolors, nc): data[d][i] = M[i, i+d] = W[color(i + comp_d)][i],
    masking off-grid columns.  Returns (data, offsets) with empty diagonals
    pruned."""
    import itertools

    strides = tuple(2 * r + 1 for r in creach)
    nc = int(np.prod(cdims))
    cstr = []
    s = 1
    for d in reversed(cdims):
        cstr.append(s)
        s *= d
    cstr = cstr[::-1]

    offs, comps = [], []
    for comp in itertools.product(*[range(-r, r + 1) for r in creach]):
        offs.append(sum(c * st for c, st in zip(comp, cstr)))
        comps.append(comp)
    order = np.argsort(offs)

    coords = np.unravel_index(np.arange(nc), cdims)
    data = np.zeros((len(offs), nc), dtype=Wh.dtype)
    out_offsets = []
    rows_idx = np.arange(nc)
    for t in order:
        comp = comps[t]
        col_color = 0
        valid = np.ones(nc, dtype=bool)
        for x, c, s_, dim in zip(coords, comp, strides, cdims):
            col_color = col_color * s_ + (x + c) % s_
            valid &= (x + c >= 0) & (x + c < dim)
        vals = np.where(valid, Wh[col_color, rows_idx], 0.0)
        data[len(out_offsets)] = vals
        out_offsets.append(offs[t])

    keep = np.abs(data).max(axis=1) > 0
    return data[keep], tuple(int(o) for o, k in zip(out_offsets, keep) if k)


def probe_coarse_operator(Mop, cdims, creach, dtype):
    """Recover the DIA representation of the coarse operator M by applying
    it to lattice-colored indicators.  Returns (data (D, nc), offsets)."""
    strides = tuple(2 * r + 1 for r in creach)
    ncolors = int(np.prod(strides))
    cid = _color_field(cdims, strides, dtype)          # (nc,)
    # sequential map keeps peak memory at one fine-grid probe
    W = jax.lax.map(
        lambda c: Mop((cid == c).astype(dtype)), jnp.arange(ncolors)
    )                                                  # (ncolors, nc)
    return _extract_from_probes(np.asarray(W), cdims, creach)


# ----------------------------------------------------------------------
# the builder
# ----------------------------------------------------------------------

def _probe_comps(cdims, creach):
    """Static probe stencil: per-color coarse offsets and their per-dim
    components, sorted by flat offset."""
    import itertools

    cstr = []
    s = 1
    for d in reversed(cdims):
        cstr.append(s)
        s *= d
    cstr = cstr[::-1]
    offs, comps = [], []
    for comp in itertools.product(*[range(-r, r + 1) for r in creach]):
        offs.append(sum(c * st for c, st in zip(comp, cstr)))
        comps.append(comp)
    order = np.argsort(offs)
    return (
        [offs[t] for t in order],
        np.asarray([comps[t] for t in order], dtype=np.int32),
    )


def _device_extract(W, cdims, creach):
    """On-device DIA extraction from the probe responses:
    data[t, i] = M[i, i+off_t] = W[color(i + comp_t), i], masking off-grid
    columns.  Only a (T,)-sized nonzero mask ever needs the host — the
    coarse matrix data never leaves the device (the tunnelled-device
    bottleneck is exactly this transfer)."""
    strides = tuple(2 * r + 1 for r in creach)
    nc = int(np.prod(cdims))
    _, comps = _probe_comps(cdims, creach)
    comps_d = jnp.asarray(comps)                     # (T, ndim)
    coords = jnp.stack(
        jnp.unravel_index(jnp.arange(nc), cdims)
    ).astype(jnp.int32)                              # (ndim, nc)
    xc = coords[None, :, :] + comps_d[:, :, None]    # (T, ndim, nc)
    valid = jnp.ones(xc.shape[::2], dtype=bool)      # (T, nc)
    col_color = jnp.zeros(xc.shape[::2], dtype=jnp.int32)
    for i, (s, dim) in enumerate(zip(strides, cdims)):
        col_color = col_color * s + xc[:, i, :] % s
        valid &= (xc[:, i, :] >= 0) & (xc[:, i, :] < dim)
    rows = jnp.arange(nc, dtype=jnp.int32)
    data = jnp.where(valid, W[col_color, rows[None, :]], 0.0)  # (T, nc)
    absmax = jnp.max(jnp.abs(data), axis=1)
    return data, absmax


def _probe_galerkin(A, gt, cdims, creach, dtype):
    strides = tuple(2 * r + 1 for r in creach)
    ncolors = int(np.prod(strides))
    cid = _color_field(cdims, strides, dtype)
    W = jax.lax.map(
        lambda c: gt.restrict(
            spmv(A, gt.prolong((cid == c).astype(dtype)))
        ),
        jnp.arange(ncolors),
    )
    data, absmax = _device_extract(W, cdims, creach)
    nnz_c = jnp.sum((data != 0).astype(jnp.int32))
    return data, absmax, nnz_c


def _make_level_builder(offsets, dims, cdims, creach, shape, nnz,
                        omega, eps, dtype, keep_idx=None):
    """One jitted program per level: smoother S/Sᵀ + all probe
    applications + on-device stencil extraction (compile count and
    device→host traffic both matter on remote/tunnelled devices).

    keep_idx (static tuple) selects the predicted-nonzero probe diagonals
    on device; absmax over ALL probed diagonals is still returned so the
    caller can verify the prediction."""

    @jax.jit
    def build(A_data):
        A = DiaMatrix(data=A_data, offsets=offsets, shape=shape, nnz=nnz)
        S = dia_filtered_smoother(A, omega, eps)
        St = S.transpose()
        gt = GridTransfer(S=S, St=St, fine_dims=dims, coarse_dims=cdims)
        data, absmax, nnz_c = _probe_galerkin(A, gt, cdims, creach, dtype)
        if keep_idx is not None:
            data = data[jnp.asarray(keep_idx, dtype=jnp.int32)]
            nnz_c = jnp.sum((data != 0).astype(jnp.int32))
        return S.data, St.data, data, absmax, nnz_c

    return build


# ----------------------------------------------------------------------
# host-side stencil-pattern prediction (enables compiling every level's
# probe program concurrently, before any device work has produced the
# coarse operators)
# ----------------------------------------------------------------------

def _np_filtered_smoother(data, offsets, n, omega, eps):
    """Numpy mirror of dia_filtered_smoother (value-exact in f64)."""
    dia = data[offsets.index(0)]
    eps2 = eps * eps
    L = max(0, -min(offsets))
    R = max(0, max(offsets))
    dia_p = np.pad(dia, (L, R))
    strong = np.zeros((len(offsets), n), dtype=bool)
    for k, d in enumerate(offsets):
        if d == 0:
            continue
        dia_d = dia_p[L + d : L + d + n]
        v = data[k]
        strong[k] = eps2 * dia * dia_d < v * v
    dia_F = np.where(strong, 0.0, data).sum(axis=0)
    inv_dF = np.where(dia_F != 0, 1.0 / np.where(dia_F == 0, 1.0, dia_F), 0.0)
    S = np.zeros_like(data)
    for k, d in enumerate(offsets):
        if d == 0:
            S[k] = 1.0 - omega
        else:
            S[k] = np.where(strong[k], -omega * inv_dF * data[k], 0.0)
    return S


def _dia_np_to_scipy(data, offsets, n):
    import scipy.sparse as sp

    rows, cols, vals = [], [], []
    for k, d in enumerate(offsets):
        i = np.arange(max(0, -d), min(n, n - d))
        rows.append(i)
        cols.append(i + d)
        vals.append(data[k, i])
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()


def _small_dia_data(offsets, comps, interior, dims):
    """Constant-coefficient DIA data on a (small) grid: diagonal k carries
    interior[k] wherever the *per-axis* shifted coordinate stays on the
    grid (the structured-operator zeroing pattern)."""
    n = int(np.prod(dims))
    coords = np.unravel_index(np.arange(n), dims)
    data = np.zeros((len(offsets), n))
    for k, comp in enumerate(comps):
        ok = np.ones(n, dtype=bool)
        for x, c, dim in zip(coords, comp, dims):
            ok &= (x + c >= 0) & (x + c < dim)
        data[k, ok] = interior[k]
    return data


def _expand_matrix(fd, cd):
    import scipy.sparse as sp

    i = np.arange(fd)
    return sp.coo_matrix((np.ones(fd), (i, i // 2)), shape=(fd, cd)).tocsr()


def _predict_level(offsets, comps, interior, real_dims, omega, eps):
    """One coarsening step on a small same-parity grid (host scipy, f64):
    returns (kept coarse comps sorted by real flat offset, their interior
    values, coarse interior row ok) — the compile-time signature of the
    next level without touching the device."""
    import scipy.sparse as sp

    rA = tuple(max(abs(c[i]) for c in comps) for i in range(len(real_dims)))
    small = tuple(
        min(rd, max(4 * a + 6, 9) + ((rd ^ (max(4 * a + 6, 9))) & 1))
        for a, rd in zip(rA, real_dims)
    )
    ns = int(np.prod(small))
    # flat offsets valid on the small grid, recomputed from the components
    sstr = []
    s = 1
    for d in reversed(small):
        sstr.append(s)
        s *= d
    sstr = sstr[::-1]
    small_offs = [sum(c * st for c, st in zip(comp, sstr)) for comp in comps]
    data = _small_dia_data(small_offs, comps, interior, small)
    A_s = _dia_np_to_scipy(data, small_offs, ns)
    S_s = _dia_np_to_scipy(
        _np_filtered_smoother(data, list(small_offs), ns, omega, eps),
        small_offs, ns,
    )
    cdims_s = tuple((d + 1) // 2 for d in small)
    U = None
    for fd, cd in zip(small, cdims_s):
        F = _expand_matrix(fd, cd)
        U = F if U is None else sp.kron(U, F, format="csr")
    P = sp.csr_matrix(S_s @ U)
    M = sp.csr_matrix(U.T @ (S_s.T @ (A_s @ P)))
    M.sum_duplicates()
    Mc = M.tocoo()
    ci = np.stack(np.unravel_index(Mc.row, cdims_s))
    cj = np.stack(np.unravel_index(Mc.col, cdims_s))
    delta = (cj - ci).T                      # (nnz, ndim)
    vmax = np.abs(Mc.data).max() if Mc.nnz else 1.0
    sig = np.abs(Mc.data) > 1e-12 * vmax
    # per-comp max |value| and an interior sample value
    uniq, inv = np.unique(delta[sig], axis=0, return_inverse=True)
    # interior values: row at the center of the small coarse grid
    center = np.ravel_multi_index(
        tuple(d // 2 for d in cdims_s), cdims_s
    )
    crow = {tuple(d): 0.0 for d in uniq}
    on_center = Mc.row == center
    for r, c, v in zip(Mc.row[on_center], Mc.col[on_center],
                       Mc.data[on_center]):
        dd = tuple(
            int(a - b)
            for a, b in zip(np.unravel_index(c, cdims_s),
                            np.unravel_index(r, cdims_s))
        )
        if dd in crow:
            crow[dd] = v
    kept = [tuple(int(x) for x in d) for d in uniq]
    # real-level flat offsets (sorted, like _probe_comps ordering)
    cdims_r = tuple((d + 1) // 2 for d in real_dims)
    cstr = []
    s = 1
    for d in reversed(cdims_r):
        cstr.append(s)
        s *= d
    cstr = cstr[::-1]
    flat = [sum(c * st for c, st in zip(comp, cstr)) for comp in kept]
    order = np.argsort(flat)
    kept = [kept[t] for t in order]
    flat = [flat[t] for t in order]
    vals = [crow[k] for k in kept]
    if len(set(flat)) != len(flat):
        raise _PredictFailed("ambiguous flat offsets on coarse grid")
    return kept, np.asarray(vals), tuple(flat), cdims_r


class _PredictFailed(Exception):
    pass


def _predict_cache_path(key: str):
    import hashlib
    import os

    d = os.path.join(
        os.environ.get("XDG_CACHE_HOME", "/tmp"), "amgcl_tpu_predict"
    )
    os.makedirs(d, exist_ok=True)
    return os.path.join(
        d, hashlib.sha256(key.encode()).hexdigest()[:24] + ".json"
    )


def _predict_plan(A: DiaMatrix, dims, prm, relax_factor, eps_strong,
                  _predict_stats=None):
    """Level-by-level compile-time signatures (offsets, dims, creach,
    keep_idx) predicted on the host from the interior stencil — exact for
    (near-)constant-coefficient operators; callers verify against the
    device absmax and fall back when the prediction misses signal.

    The prediction is pure metadata keyed by (stencil values, dims,
    params); on hosts where fresh pages fault at ~10 MB/s the scipy
    temporaries make it expensive, so results are cached on disk."""
    import json
    import os
    import time as _t

    stats = _predict_stats if isinstance(_predict_stats, dict) else {}
    t0 = _t.perf_counter()
    if getattr(A, "stencil_hint", None) is not None:
        # Assembler-provided interior stencil: zero device programs in
        # the whole predict phase (the absmax verification still checks
        # it during setup, so a wrong hint only costs the fallback).
        interior = np.asarray(A.stencil_hint, dtype=np.float64)
    else:
        center = int(
            np.ravel_multi_index(tuple(d // 2 for d in dims), dims)
        )
        # This device fetch is the first *forced* sync after assembly on
        # async-dispatch backends: it absorbs any queued compile/execute
        # work, so time it separately (the host predict is ~0.5 s).
        interior = np.asarray(A.data[:, center], dtype=np.float64)
    stats["fetch_s"] = _t.perf_counter() - t0
    t0 = _t.perf_counter()

    key = json.dumps([
        [int(o) for o in A.offsets], [float(v) for v in interior],
        list(dims), prm.max_levels, prm.coarse_enough,
        float(relax_factor), float(eps_strong),
    ])
    cpath = _predict_cache_path(key)
    try:
        with open(cpath) as f:
            cached = json.load(f)
        if cached["key"] == key:
            stats["host_s"] = _t.perf_counter() - t0
            specs = [
                dict(
                    offsets=tuple(sp_["offsets"]),
                    dims=tuple(sp_["dims"]),
                    cdims=tuple(sp_["cdims"]),
                    creach=tuple(sp_["creach"]),
                    shape=tuple(sp_["shape"]),
                    keep_idx=tuple(sp_["keep_idx"]),
                    c_offs=tuple(sp_["c_offs"]),
                )
                for sp_ in cached["specs"]
            ]
            return specs, tuple(cached["coarsest"])
    except Exception:
        pass

    specs, coarsest = _predict_plan_impl(
        interior, tuple(A.offsets), dims, prm, relax_factor, eps_strong,
        A.shape[0],
    )
    stats["host_s"] = _t.perf_counter() - t0
    try:
        tmp = cpath + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({
                "key": key,
                "specs": [
                    {k: list(v) if isinstance(v, tuple) else v
                     for k, v in sp_.items()}
                    for sp_ in specs
                ],
                "coarsest": list(coarsest),
            }, f)
        os.replace(tmp, cpath)
    except Exception:
        pass
    return specs, coarsest


def _predict_plan_impl(interior, offsets, dims, prm, relax_factor,
                       eps_strong, n0):
    comps = decompose_offsets(offsets, dims)
    eps = eps_strong
    omega = relax_factor * 2.0 / 3.0
    specs = []
    cur_dims = tuple(dims)
    n = n0
    while len(specs) < prm.max_levels and n > prm.coarse_enough:
        rA = tuple(max(abs(c[i]) for c in comps) for i in range(len(cur_dims)))
        cdims = tuple((d + 1) // 2 for d in cur_dims)
        creach = tuple(
            max(1, min((1 + 3 * a) // 2, cd - 1))
            for a, cd in zip(rA, cdims)
        )
        kept, vals, flat, _ = _predict_level(
            offsets, comps, interior, cur_dims, omega, eps
        )
        if any(
            any(abs(c) > r for c, r in zip(comp, creach)) for comp in kept
        ):
            raise _PredictFailed("predicted stencil exceeds probe reach")
        # positions of kept comps in the probe-box enumeration
        all_offs, all_comps = _probe_comps(cdims, creach)
        pos = {tuple(c): t for t, c in enumerate(all_comps)}
        keep_idx = tuple(pos[k] for k in kept)
        specs.append(dict(
            offsets=offsets, dims=cur_dims, cdims=cdims, creach=creach,
            shape=(n, n), keep_idx=keep_idx, c_offs=flat,
        ))
        offsets, comps, interior = flat, kept, vals
        cur_dims = cdims
        n = int(np.prod(cdims))
        eps *= 0.5
    return specs, offsets


def _make_level_rebuilder(offsets, dims, cdims, creach, shape, nnz, dtype):
    """Rebuild variant: reuse the existing transfer smoother S/Sᵀ and
    re-probe the Galerkin coefficients for a matrix with new values —
    the device-side analogue of amg::rebuild (amgcl/amg.hpp:229-269,
    which reuses P/R wholesale)."""

    @jax.jit
    def rebuild(A_data, S_data, St_data):
        A = DiaMatrix(data=A_data, offsets=offsets, shape=shape, nnz=nnz)
        S = DiaMatrix(data=S_data, offsets=offsets, shape=shape, nnz=nnz)
        St = DiaMatrix(
            data=St_data, offsets=tuple(-d for d in reversed(offsets)),
            shape=shape, nnz=nnz,
        )
        gt = GridTransfer(S=S, St=St, fine_dims=dims, coarse_dims=cdims)
        data, absmax, nnz_c = _probe_galerkin(A, gt, cdims, creach, dtype)
        return data, absmax, nnz_c

    return rebuild


def _creach_for(offsets, dims, cdims):
    """Coarse stencil reach per axis: column c's fine support is its
    2-cell box smeared by S then A then Sᵀ (each of reach rA, and S
    shares A's offsets), i.e. [2c - 2rA, 2c+1 + 2rA] against a row
    window [2c' - rA, 2c'+1 + rA]; overlap requires
    |2Δ| <= 1 + 3rA, so |Δ| <= (1 + 3rA)//2.  This is tight: rA=1
    gives the familiar 5-coloring (125 probes in 3D), rA=2 gives 7
    (343) — a looser (3rA+2)//2 bound over-colors rA=2 to 9 (729),
    doubling probe work and compile size on coarse levels."""
    rA = reach(offsets, dims)
    return tuple(
        max(1, min((1 + 3 * a) // 2, cd - 1))
        for a, cd in zip(rA, cdims)
    )


def _finish_level(A, dims, cdims, creach, S_data, St_data, data, keep_idx,
                  c_offs, nnz_c, relaxation, levels, plan, dtype):
    S = DiaMatrix(data=S_data, offsets=A.offsets, shape=A.shape, nnz=A.nnz)
    St = DiaMatrix(
        data=St_data, offsets=tuple(-d for d in reversed(A.offsets)),
        shape=A.shape, nnz=A.nnz,
    )
    gt = GridTransfer(S=S, St=St, fine_dims=dims, coarse_dims=cdims)
    relax_state = _dia_relax_setup(relaxation, A)
    nc = int(np.prod(cdims))
    Ac = DiaMatrix(data=data, offsets=tuple(c_offs), shape=(nc, nc),
                   nnz=int(nnz_c))
    levels.append(Level(A=A, P=gt, R=gt, relax=relax_state, coarse_inv=None))
    plan.append(dict(
        offsets=A.offsets, dims=dims, cdims=cdims, creach=creach,
        shape=A.shape, nnz=A.nnz, keep_idx=np.asarray(keep_idx),
        c_offs=tuple(c_offs), c_nnz=int(nnz_c), dtype=dtype,
    ))
    return Ac


def _build_sequential(A, dims, eps, prm, relaxation, relax_factor, dtype,
                      levels, plan):
    """The compile-as-you-go path (each level's probe program is compiled
    only once the previous level's offsets are known on host) — the
    correct-by-construction fallback when prediction fails."""
    while len(levels) < prm.max_levels and A.shape[0] > prm.coarse_enough:
        omega = relax_factor * 2.0 / 3.0
        cdims = tuple((d + 1) // 2 for d in dims)
        creach = _creach_for(A.offsets, dims, cdims)
        build = _make_level_builder(
            A.offsets, dims, cdims, creach, A.shape, A.nnz,
            omega, eps, dtype,
        )
        S_data, St_data, data_all, absmax, nnz_c = build(A.data)
        eps *= 0.5
        all_offs, _ = _probe_comps(cdims, creach)
        keep = np.asarray(absmax) > 0
        keep_idx = np.flatnonzero(keep)
        c_offs = tuple(int(o) for o, k in zip(all_offs, keep) if k)
        A = _finish_level(
            A, dims, cdims, creach, S_data, St_data, data_all[keep_idx],
            keep_idx, c_offs, nnz_c, relaxation, levels, plan, dtype,
        )
        dims = cdims
    return A


def build_grid_hierarchy(
    A: DiaMatrix,
    dims,
    *,
    params: AMGParams | None = None,
    relaxation=None,
    relax_factor: float = 1.0,
    eps_strong: float = 0.08,
    dtype=jnp.float32,
    setup_stats: dict | None = None,
):
    """Build the whole hierarchy on device. A: fine matrix in DIA (device).

    Returns (levels, params, rebuild_plan); levels/params are compatible
    with precond.amg.amg_apply.

    Fast path: per-level stencil patterns are *predicted on the host*
    from the interior stencil (small same-parity grid, f64 scipy), so all
    level probe programs AOT-compile **concurrently** before any device
    work — on tunnelled devices where each XLA compile costs seconds,
    this turns setup from Σ(compile_l) into max(compile_l).  The device
    absmax over every probed diagonal verifies each prediction; any
    missed signal (> 1e-5 relative) falls back to the sequential
    compile-as-you-go path from that level down."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    prm = params or AMGParams()
    relaxation = relaxation or rlx.SPAI0()
    levels = []
    plan = []     # per-level rebuild info (amg::rebuild parity)
    dims = tuple(dims)
    eps = eps_strong
    stats = setup_stats if setup_stats is not None else {}
    stats.update(predicted=False, fallback_level=None, compile_s=0.0,
                 execute_s=0.0)

    import time as _t
    t_pred = _t.perf_counter()
    specs = None
    try:
        specs, _ = _predict_plan(A, dims, prm, relax_factor, eps_strong,
                                 _predict_stats=stats)
    except Exception:
        specs = None
    stats["predict_s"] = _t.perf_counter() - t_pred

    if specs:
        stats["predicted"] = True
        omega = relax_factor * 2.0 / 3.0
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=min(8, len(specs) + 1)) as ex:
            # level programs + coarsest inverse compile through the AOT
            # memo: a speculative precompile_grid_setup launched while
            # the tunnel session was warming up already has them in
            # flight (or done), so this degenerates to future lookups.
            futs = [
                _compile_level_memo(sp_, l, omega, eps_strong, dtype)
                for l, sp_ in enumerate(specs)
            ]
            last = specs[-1]
            n_last = int(np.prod(last["cdims"]))
            inv_fut = _compile_inverse_memo(last["c_offs"], n_last, dtype)
            # warm the tiny relax-state programs (jit-cache warmers)
            for l in range(len(specs)):
                ex.submit(
                    _warm_relax_program, relaxation,
                    specs[l]["offsets"], specs[l]["shape"][0], dtype,
                )

            for l, (sp_, fut) in enumerate(zip(specs, futs)):
                compiled = fut.result()
                t1 = time.perf_counter()
                S_data, St_data, data_k, absmax, nnz_c = compiled(A.data)
                am = np.asarray(absmax)
                stats["execute_s"] += time.perf_counter() - t1
                mask = np.zeros(len(am), dtype=bool)
                mask[list(sp_["keep_idx"])] = True
                top = am.max() if am.size else 0.0
                if am.size and (am[~mask] > 1e-5 * max(top, 1e-30)).any():
                    # prediction missed real signal: rebuild this level
                    # and everything below with the exact path.  The
                    # deeper futures are memoized — let them finish
                    # rather than poisoning the memo with cancellations
                    # (fallback is rare; a wasted compile is harmless).
                    stats["fallback_level"] = l
                    A = _build_sequential(
                        A, dims, eps, prm, relaxation, relax_factor,
                        dtype, levels, plan,
                    )
                    dims = None
                    break
                A = _finish_level(
                    A, dims, sp_["cdims"], sp_["creach"], S_data, St_data,
                    data_k, np.asarray(sp_["keep_idx"]), sp_["c_offs"],
                    nnz_c, relaxation, levels, plan, dtype,
                )
                dims = sp_["cdims"]
                eps *= 0.5
            coarse_inv = None
            if stats["fallback_level"] is None:
                try:
                    inv_c = inv_fut.result()
                    if A.offsets == tuple(last["c_offs"]):
                        coarse_inv = inv_c(A.data)
                except Exception:
                    coarse_inv = None
        stats["compile_s"] = (
            time.perf_counter() - t0 - stats["execute_s"]
        )
        if coarse_inv is None:
            stats["inv_fallback"] = True
            t_inv = time.perf_counter()
            coarse_inv = _dia_dense_inverse(A)
            stats["inv_s"] = time.perf_counter() - t_inv
        levels.append(
            Level(A=A, P=None, R=None, relax=None, coarse_inv=coarse_inv)
        )
        return tuple(levels), prm, plan

    # prediction unavailable: sequential compile-as-you-go
    A = _build_sequential(
        A, dims, eps, prm, relaxation, relax_factor, dtype, levels, plan
    )
    levels.append(
        Level(A=A, P=None, R=None, relax=None,
              coarse_inv=_dia_dense_inverse(A))
    )
    return tuple(levels), prm, plan


def _densify_inv_fn(offsets, n):
    """The coarsest-level densify+invert program (shared by the eager and
    the AOT-compiled paths)."""

    def densify_inv(data):
        offs = jnp.asarray(offsets)[:, None]              # (D, 1)
        rows = jnp.arange(n)[None, :]                     # (1, n)
        cols = rows + offs                                # (D, n)
        ok = (cols >= 0) & (cols < n)
        flat = rows * n + jnp.clip(cols, 0, n - 1)
        # Invert in f64 where the backend supports it (CPU); TPU
        # LuDecomposition only implements F32/C64 (f64 fails to
        # compile), and there the f32 coarse-solve error sits inside an
        # f32 preconditioner whose error the outer Krylov / defect
        # correction absorbs.
        inv_dt = (
            jnp.float64 if jax.default_backend() == "cpu" else data.dtype
        )
        dense = (
            jnp.zeros(n * n, dtype=inv_dt)
            .at[flat.reshape(-1)]
            .add(jnp.where(ok, data, 0.0).astype(inv_dt).reshape(-1))
            .reshape(n, n)
        )
        return jnp.linalg.inv(dense).astype(data.dtype)

    return densify_inv


def _dia_dense_inverse(A: DiaMatrix) -> jax.Array:
    """Densify a (small) DIA matrix and invert it, all on device in ONE
    program — eager per-diagonal updates would cost a dispatch round trip
    each on tunnelled devices."""
    return jax.jit(_densify_inv_fn(A.offsets, A.shape[0]))(A.data)


def _make_dense_inverse_compiled(offsets, n, dtype):
    """AOT-compile the coarsest densify+invert for concurrent setup."""
    f = jax.jit(_densify_inv_fn(tuple(offsets), n))
    return f.lower(
        jax.ShapeDtypeStruct((len(offsets), n), dtype)
    ).compile()


# ----------------------------------------------------------------------
# AOT memo + speculative precompile
# ----------------------------------------------------------------------
# Compiled level-builder programs keyed by their full compile-time
# signature.  Values are concurrent futures so a speculative precompile
# (below) and the real setup can race without duplicating server work.
_AOT_MEMO: dict = {}
_AOT_LOCK = None
_AOT_POOL = None


def _aot_pool():
    global _AOT_LOCK, _AOT_POOL
    import threading
    from concurrent.futures import ThreadPoolExecutor

    if _AOT_LOCK is None:
        _AOT_LOCK = threading.Lock()
    if _AOT_POOL is None:
        _AOT_POOL = ThreadPoolExecutor(max_workers=8)
    return _AOT_POOL


def _level_compile_key(sp_, l, omega, eps_strong, dtype):
    return (
        tuple(sp_["offsets"]), tuple(sp_["dims"]), tuple(sp_["cdims"]),
        tuple(sp_["creach"]), tuple(sp_["shape"]),
        tuple(sp_["keep_idx"]), float(omega),
        float(eps_strong * (0.5 ** l)), jnp.dtype(dtype).str,
    )


def _compile_level_memo(sp_, l, omega, eps_strong, dtype):
    """Compile (or fetch) one level-builder executable through the memo."""
    key = _level_compile_key(sp_, l, omega, eps_strong, dtype)
    pool = _aot_pool()
    with _AOT_LOCK:
        fut = _AOT_MEMO.get(key)
        if fut is None:
            def compile_():
                b = _make_level_builder(
                    sp_["offsets"], sp_["dims"], sp_["cdims"],
                    sp_["creach"], sp_["shape"], 0,
                    omega, eps_strong * (0.5 ** l), dtype,
                    keep_idx=sp_["keep_idx"],
                )
                D = len(sp_["offsets"])
                return b.lower(
                    jax.ShapeDtypeStruct((D, sp_["shape"][0]), dtype)
                ).compile()

            fut = pool.submit(compile_)
            _AOT_MEMO[key] = fut
    return fut


def _compile_inverse_memo(c_offs, n, dtype):
    key = ("inv", tuple(c_offs), int(n), jnp.dtype(dtype).str)
    pool = _aot_pool()
    with _AOT_LOCK:
        fut = _AOT_MEMO.get(key)
        if fut is None:
            fut = pool.submit(
                _make_dense_inverse_compiled, tuple(c_offs), int(n), dtype
            )
            _AOT_MEMO[key] = fut
    return fut


def precompile_grid_setup(
    offsets,
    stencil,
    dims,
    *,
    params: AMGParams | None = None,
    relax_factor: float = 1.0,
    eps_strong: float = 0.08,
    dtype=jnp.float32,
):
    """Speculatively compile the whole grid-setup program set from host
    metadata only (interior stencil + grid dims) — no device array needed.

    On tunnelled devices the first dispatch of a fresh process pays
    ~2 min of server-side session setup; launching this in a background
    thread at import time overlaps every hierarchy compile with that
    unavoidable wait, so the subsequent real setup finds its executables
    in the memo (the reference has no analogue: its CPU setup never waits
    on a compile service).  Returns a list of futures; callers may ignore
    it (the memo is consulted by build_grid_hierarchy)."""
    prm = params or AMGParams()
    interior = np.asarray(stencil, dtype=np.float64)
    n = int(np.prod(dims))
    specs, _ = _predict_plan_impl(
        interior, tuple(offsets), tuple(dims), prm, relax_factor,
        eps_strong, n,
    )
    omega = relax_factor * 2.0 / 3.0
    futs = [
        _compile_level_memo(sp_, l, omega, eps_strong, dtype)
        for l, sp_ in enumerate(specs)
    ]
    if specs:
        last = specs[-1]
        futs.append(_compile_inverse_memo(
            last["c_offs"], int(np.prod(last["cdims"])), dtype
        ))
    return futs


def _warm_relax_program(relaxation, offsets, n, dtype):
    """Pre-populate the jit cache for the per-level relax-state programs
    (tiny, but each costs a compile round trip on tunnelled devices)."""
    try:
        from ..relaxation.spai0 import SPAI0
        from ..relaxation.damped_jacobi import DampedJacobi

        offsets = tuple(offsets)
        if 0 not in offsets:
            return
        dia_idx = offsets.index(0)
        z = jnp.zeros((len(offsets), n), dtype)
        if isinstance(relaxation, SPAI0):
            _spai0_arrays(z, dia_idx)
        elif isinstance(relaxation, DampedJacobi):
            _jacobi_arrays(z, dia_idx)
    except Exception:
        pass


class GridAMG:
    """AMG with the hierarchy constructed on-device (drop-in for AMG when
    the problem lives on a logical grid)."""

    def __init__(
        self,
        A,
        dims,
        *,
        relaxation=None,
        params: AMGParams | None = None,
        dtype=jnp.float32,
        eps_strong: float = 0.08,
        relax_factor: float = 1.0,
    ):
        if not isinstance(A, DiaMatrix):
            A = DiaMatrix.from_scipy(A, dtype=dtype)
        if A.dtype != jnp.dtype(dtype):
            A = A.astype(dtype)
        self.dtype = dtype
        self.relaxation = relaxation or rlx.SPAI0()
        self.setup_stats = {}
        self.levels, self.prm, self._plan = build_grid_hierarchy(
            A, dims, params=params, relaxation=self.relaxation,
            relax_factor=relax_factor, eps_strong=eps_strong, dtype=dtype,
            setup_stats=self.setup_stats,
        )
        self._rebuilders = None

    def rebuild(self, A_new) -> "GridAMG":
        """Reuse the transfer operators (S/Sᵀ and the grid maps) for a
        matrix with the same sparsity but new coefficients — the
        device-side analogue of amg::rebuild (amgcl/amg.hpp:229-269).
        Runs entirely on device; with the per-level programs already
        compiled this costs milliseconds, the 'warm restart' for
        time-dependent problems."""
        import dataclasses as _dc

        if not isinstance(A_new, DiaMatrix):
            A_new = DiaMatrix.from_scipy(A_new, dtype=self.dtype)
        if A_new.dtype != jnp.dtype(self.dtype):
            A_new = A_new.astype(self.dtype)
        if self._rebuilders is None:
            self._rebuilders = [
                _make_level_rebuilder(
                    pl["offsets"], pl["dims"], pl["cdims"], pl["creach"],
                    pl["shape"], pl["nnz"], pl["dtype"],
                )
                for pl in self._plan
            ]
        A = A_new
        new_levels = []
        for lvl, pl, rb in zip(self.levels, self._plan, self._rebuilders):
            if A.offsets != pl["offsets"]:
                raise ValueError(
                    "rebuild requires the same sparsity pattern "
                    f"(level offsets changed: {len(A.offsets)} vs "
                    f"{len(pl['offsets'])})"
                )
            relax = _dia_relax_setup(self.relaxation, A)
            data_all, absmax, nnz_c = rb(A.data, lvl.P.S.data, lvl.P.St.data)
            # The coarse stencil is pinned to the original build; if a new
            # coefficient pattern activates a probed offset that cancelled
            # to zero at build time, silently dropping it would corrupt
            # the hierarchy — demand a full setup instead.
            new_keep = np.flatnonzero(np.asarray(absmax) > 0)
            if not np.isin(new_keep, pl["keep_idx"]).all():
                raise ValueError(
                    "rebuild: the coarse stencil grew with the new "
                    "coefficients; run a full setup (GridAMG) instead"
                )
            Ac = DiaMatrix(
                data=data_all[pl["keep_idx"]],
                offsets=pl["c_offs"],
                shape=(int(np.prod(pl["cdims"])),) * 2,
                nnz=int(nnz_c),
            )
            new_levels.append(_dc.replace(lvl, A=A, relax=relax))
            A = Ac
        new_levels.append(
            _dc.replace(
                self.levels[-1], A=A, coarse_inv=_dia_dense_inverse(A)
            )
        )
        self.levels = tuple(new_levels)
        return self

    def apply(self, r):
        from .amg import amg_apply

        return amg_apply(self.levels, r, self.prm)

    def system_matrix(self):
        return self.levels[0].A

    def __call__(self, r):
        return self.apply(r)

    def __repr__(self):
        from ..utils.report import hierarchy_report

        return hierarchy_report(self)


@partial(jax.jit, static_argnames=("dia_idx",))
def _spai0_arrays(data, dia_idx):
    dia = data[dia_idx]
    row_sq = jnp.sum(data * data, axis=0)
    return jnp.where(row_sq > 0, dia / jnp.where(row_sq == 0, 1.0, row_sq),
                     1.0)


@partial(jax.jit, static_argnames=("dia_idx",))
def _jacobi_arrays(data, dia_idx):
    dia = data[dia_idx]
    return 1.0 / jnp.where(dia != 0, dia, 1.0)


@jax.jit
def _gershgorin(data):
    return jnp.max(jnp.sum(jnp.abs(data), axis=0))


def _dia_relax_setup(relaxation, A: DiaMatrix):
    """Device-side smoother state from DIA data (SPAI0, damped Jacobi,
    Chebyshev), each one jitted program per shape — eager op chains cost
    a compile round trip apiece on tunnelled devices.  Other smoothers
    fall back to a host round-trip."""
    from ..relaxation.spai0 import SPAI0, SPAI0State
    from ..relaxation.damped_jacobi import DampedJacobi, JacobiState
    from ..relaxation.chebyshev import Chebyshev, ChebyshevState

    dia_idx = A.offsets.index(0)

    if isinstance(relaxation, SPAI0):
        return SPAI0State(m=_spai0_arrays(A.data, dia_idx))
    if isinstance(relaxation, DampedJacobi):
        return JacobiState(
            inv_dia=_jacobi_arrays(A.data, dia_idx),
            damping=jnp.asarray(relaxation.damping, A.dtype),
        )
    if isinstance(relaxation, Chebyshev) and not relaxation.scale:
        rho = _gershgorin(A.data)
        lo = rho * relaxation.lower
        hi = rho * relaxation.higher
        return ChebyshevState(
            c=((hi - lo) / 2).astype(A.dtype),
            d=((hi + lo) / 2).astype(A.dtype),
            inv_dia=jnp.ones(1, A.dtype),
            degree=relaxation.degree,
            scale=False,
        )
    # generic fallback: host round-trip
    A_host = A.to_scipy()
    return relaxation.setup(A_host, A)
