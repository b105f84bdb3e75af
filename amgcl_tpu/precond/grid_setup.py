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
                        omega, eps, dtype):
    """One jitted program per level: smoother S/Sᵀ + all probe
    applications + on-device stencil extraction (compile count and
    device→host traffic both matter on remote/tunnelled devices)."""

    @jax.jit
    def build(A_data):
        A = DiaMatrix(data=A_data, offsets=offsets, shape=shape, nnz=nnz)
        S = dia_filtered_smoother(A, omega, eps)
        St = S.transpose()
        gt = GridTransfer(S=S, St=St, fine_dims=dims, coarse_dims=cdims)
        data, absmax, nnz_c = _probe_galerkin(A, gt, cdims, creach, dtype)
        return S.data, St.data, data, absmax, nnz_c

    return build


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


def build_grid_hierarchy(
    A: DiaMatrix,
    dims,
    *,
    params: AMGParams | None = None,
    relaxation=None,
    relax_factor: float = 1.0,
    eps_strong: float = 0.08,
    dtype=jnp.float32,
):
    """Build the whole hierarchy on device. A: fine matrix in DIA (device).

    Returns (levels, params, rebuild_plan); levels/params are
    compatible with precond.amg.amg_apply."""
    prm = params or AMGParams()
    relaxation = relaxation or rlx.SPAI0()
    levels = []
    plan = []     # per-level rebuild info (amg::rebuild parity)
    dims = tuple(dims)
    eps = eps_strong

    while len(levels) < prm.max_levels and A.shape[0] > prm.coarse_enough:
        omega = relax_factor * 2.0 / 3.0
        cdims = tuple((d + 1) // 2 for d in dims)

        rA = reach(A.offsets, dims)
        # Coarse stencil reach per axis: column c's fine support is its
        # 2-cell box smeared by S then A then Sᵀ (each of reach rA, and S
        # shares A's offsets), i.e. [2c - 2rA, 2c+1 + 2rA] against a row
        # window [2c' - rA, 2c'+1 + rA]; overlap requires
        # |2Δ| <= 1 + 3rA, so |Δ| <= (1 + 3rA)//2.  This is tight: rA=1
        # gives the familiar 5-coloring (125 probes in 3D), rA=2 gives 7
        # (343) — the previous (3rA+2)//2 bound over-colored rA=2 to 9
        # (729), doubling probe work and compile size on coarse levels.
        creach = tuple(
            max(1, min((1 + 3 * a) // 2, cd - 1))
            for a, cd in zip(rA, cdims)
        )

        build = _make_level_builder(
            A.offsets, dims, cdims, creach, A.shape, A.nnz,
            omega, eps, dtype,
        )
        S_data, St_data, data_all, absmax, nnz_c = build(A.data)
        eps *= 0.5

        S = DiaMatrix(data=S_data, offsets=A.offsets, shape=A.shape, nnz=A.nnz)
        St = DiaMatrix(data=St_data, offsets=tuple(-d for d in reversed(A.offsets)),
                       shape=A.shape, nnz=A.nnz)
        gt = GridTransfer(S=S, St=St, fine_dims=dims, coarse_dims=cdims)

        relax_state = _dia_relax_setup(relaxation, A)

        # Only the (T,) nonzero mask and the nnz scalar cross the
        # device→host boundary; the coarse data stays resident.
        all_offs, _ = _probe_comps(cdims, creach)
        keep = np.asarray(absmax) > 0
        keep_idx = np.flatnonzero(keep)
        nc = int(np.prod(cdims))
        c_offs = tuple(int(o) for o, k in zip(all_offs, keep) if k)
        Ac = DiaMatrix(
            data=data_all[keep_idx],
            offsets=c_offs,
            shape=(nc, nc),
            nnz=int(nnz_c),
        )
        levels.append(Level(A=A, P=gt, R=gt, relax=relax_state,
                            coarse_inv=None))
        plan.append(dict(
            offsets=A.offsets, dims=dims, cdims=cdims, creach=creach,
            shape=A.shape, nnz=A.nnz, keep_idx=keep_idx, c_offs=c_offs,
            c_nnz=int(nnz_c), dtype=dtype,
        ))
        A, dims = Ac, cdims

    # coarsest: densify + invert on device (the matrix is tiny; staying
    # resident avoids a slow device→host pull on tunnelled setups)
    levels.append(
        Level(A=A, P=None, R=None, relax=None,
              coarse_inv=_dia_dense_inverse(A))
    )
    return tuple(levels), prm, plan


def _dia_dense_inverse(A: DiaMatrix) -> jax.Array:
    """Densify a (small) DIA matrix and invert it, all on device in ONE
    program — eager per-diagonal updates would cost a dispatch round trip
    each on tunnelled devices."""
    n = A.shape[0]
    offsets = A.offsets

    @jax.jit
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

    return densify_inv(A.data)


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
        self.levels, self.prm, self._plan = build_grid_hierarchy(
            A, dims, params=params, relaxation=self.relaxation,
            relax_factor=relax_factor, eps_strong=eps_strong, dtype=dtype,
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
