"""Pallas TPU kernel for DIA SpMV.

The XLA lowering of the shift-based DIA SpMV is already near-optimal (it
fuses the D shifted multiply-adds into one pass), but it re-reads the
shifted x windows from HBM once per diagonal.  This kernel streams each
row tile's x *halo window* into VMEM exactly once via explicit DMA and
applies all D diagonals out of VMEM — D× fewer x bytes from HBM, the
difference between ~1/D and ~1/2 of roofline for wide-stencil (coarse
AMG) operators.

Layout: data (D, n), x (n,), halo L/R from the offset range.  The grid
tiles rows; per tile the kernel copies data[:, tile] and
x[tile_start - L : tile_end + R] (pre-padded by the wrapper so indexing
is non-negative) and runs the unrolled shift-multiply-add on the VPU.

Falls back transparently: `spmv_dia_pallas(A, x)` matches `spmv(A, x)`
bit-for-bit in float32 on aligned sizes and is validated against it in
tests (interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formats import DiaMatrix, BlockDiaMatrix


def _kernel(offsets, L, T, ntiles, data_ref, xp_ref, y_ref,
            xwin, sems):
    """One row tile: Σ_d data[d] ∘ shift(x, d) out of a VMEM x window.

    The window DMA is double-buffered: tile i issues the copy for tile
    i+1 before computing, so the x transfer hides behind the diagonal
    multiply-adds (the data blocks are pipelined by pallas itself).
    Windows are (1, length)-shaped — TPU kernels want ≥2D operands;
    window starts are 128-aligned because T is and L/R are rounded."""
    i = pl.program_id(0)
    win = xwin.shape[2]
    two = jnp.int32(2)

    def copy(tile, slot):
        return pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(tile * T, win)],
            xwin.at[slot], sems.at[slot],
        )

    @pl.when(i == 0)
    def _first():
        copy(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + 1 < ntiles)
    def _prefetch():
        copy(i + 1, jax.lax.rem(i + 1, two)).start()

    slot = jax.lax.rem(i, two)
    copy(i, slot).wait()
    acc = jnp.zeros((1, T), data_ref.dtype)
    for k, d in enumerate(offsets):
        seg = xwin[slot, :, pl.ds(L + d, T)]
        acc = acc + data_ref[k, :].reshape(1, T) * seg
    y_ref[...] = acc


def _default_tile(D: int, itemsize: int) -> int:
    """Row-tile choice: bigger tiles amortize the halo re-reads
    (0.74 -> 0.44 ms at 150³/7 diagonals going 8K -> 128K rows), bounded
    so the per-tile data block stays near 4MB of the 16MB scoped VMEM
    (window + output + pipelining fit alongside it).  Rounded DOWN to a
    power of two so tiles of different (D, itemsize) divide one another —
    the padded-vector Krylov layout shares one padded length across the
    f64 outer operator, the f32 inner operator and the level-0 smoother
    DIAs (all pad to the largest tile; every smaller power-of-2 tile
    then divides it exactly)."""
    budget = 4 << 20
    tile = budget // (D * itemsize)
    p2 = 8192
    while p2 * 2 <= tile:
        p2 *= 2
    return int(max(8192, min(p2, 131072)))


def prepad_pallas(obj, pad_to: int | None = None):
    """Hoist the kernel's per-call data pad out of solver loops.

    XLA does not move loop-invariant ops out of while-loop bodies, so
    the jnp.pad of A.data inside spmv_dia_pallas re-copies the whole
    operator every iteration (~0.1-0.2 ms at 23M nnz).  Mapping this
    over the operator/levels pytree at the TOP of the jitted solve pads
    each square DiaMatrix's data to its tile multiple once per call;
    spmv_dia_pallas skips its pad when the data is already wide enough.

    ``pad_to`` (the padded-vector Krylov length) widens fine-level
    operators to the common padded length so spmv_dia_padded's data
    slice also finds pre-padded data."""
    import dataclasses as _dc

    def fix(A):
        if not isinstance(A, DiaMatrix):
            return A
        n, m = A.shape
        if n != m or not A.offsets:
            return A
        tile = _default_tile(len(A.offsets), A.data.dtype.itemsize)
        n_pad = ((n + tile - 1) // tile) * tile
        if (
            pad_to is not None and pad_to > n_pad
            and pad_to % tile == 0
            # only fine-level participants: pad_to is n rounded up to the
            # largest participating tile, so the gap is < one max tile;
            # coarser levels (n much smaller) stay at their own pad
            and pad_to - n < 131072
        ):
            n_pad = pad_to
        if A.data.shape[1] >= n_pad:
            return A
        return _dc.replace(
            A,
            data=jnp.pad(A.data, ((0, 0), (0, n_pad - A.data.shape[1]))),
        )

    return jax.tree_util.tree_map(
        fix, obj, is_leaf=lambda x: isinstance(x, DiaMatrix)
    )


def spmv_dia_pallas(A: DiaMatrix, x: jax.Array, *, tile: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """y = A @ x with the Pallas streaming kernel (square DIA matrices).

    tile=None auto-sizes the row tile (see _default_tile)."""
    n, m = A.shape
    if n != m:
        raise ValueError("pallas DIA spmv supports square operators")
    if tile is None:
        tile = _default_tile(len(A.offsets), A.data.dtype.itemsize)
    # Halo paddings rounded to the 128-lane tiling so every DMA window
    # starts and ends lane-aligned (Mosaic requires aligned HBM slices).
    L = -(-max(0, -min(A.offsets)) // 128) * 128
    R = -(-max(0, max(A.offsets)) // 128) * 128
    dt = A.data.dtype
    xc = x.astype(dt)

    n_pad = ((n + tile - 1) // tile) * tile
    # pad x with the halo plus tile alignment; 2-D shapes for TPU tiling
    xp = jnp.pad(xc, (L, R + (n_pad - n))).reshape(1, -1)
    if A.data.shape[1] >= n_pad:
        # pre-padded at the top of the solve (prepad_pallas)
        data = jax.lax.slice(A.data, (0, 0), (len(A.offsets), n_pad))
    else:
        data = jnp.pad(A.data, ((0, 0), (0, n_pad - n)))
    ntiles = n_pad // tile
    win = tile + L + R

    # Index maps return i32 explicitly: under jax_enable_x64 a literal 0
    # traces as i64 and Mosaic rejects the mixed (i64, i32) index tuple.
    _imap = lambda i: (jnp.int32(0), i)
    y = pl.pallas_call(
        partial(_kernel, A.offsets, L, tile, ntiles),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((len(A.offsets), tile), _imap),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, tile), _imap),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), dt),
        scratch_shapes=[
            pltpu.VMEM((2, 1, win), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, xp)
    return y[0, :n].astype(x.dtype)


# ----------------------------------------------------------------------
# padded-layout kernel (zero-copy Krylov vectors)
# ----------------------------------------------------------------------

def dia_padded_len(A: DiaMatrix) -> int:
    """Length of the persistent padded-vector layout for ``A``: the row
    count rounded up to the kernel's tile.  Krylov loops that keep their
    vectors at this length (zero beyond row n) hit the zero-copy
    spmv_dia_padded path — no per-SpMV pad/unpad."""
    n = A.shape[0]
    tile = _default_tile(len(A.offsets), A.data.dtype.itemsize)
    return ((n + tile - 1) // tile) * tile


def dia_padded_ok(A: DiaMatrix) -> bool:
    """The padded kernel needs one full window inside the padded vector
    and halos no wider than a tile (the kernel's static three-way tile
    classification relies on T >= L, R); tiny/wide-halo operators fall
    back to the plain path."""
    n, m = A.shape
    if n != m or not A.offsets:
        return False
    tile = _default_tile(len(A.offsets), A.data.dtype.itemsize)
    L = -(-max(0, -min(A.offsets)) // 128) * 128
    R = -(-max(0, max(A.offsets)) // 128) * 128
    return dia_padded_len(A) >= tile + L + R and tile >= max(L, R)


def _kernel_padded(offsets, L, R, T, n_al, ntiles,
                   data_ref, xp_ref, y_ref, xwin, sems):
    """Row tile over a PERSISTENT padded vector (length n_al, a multiple
    of every operator's tile): the x window start is clamped into
    [0, n_al - win] and indexed through a dynamic base, with L/R zero
    guard zones in VMEM standing in for the virtual out-of-range pad.
    Every guard-zone read multiplies a stored DIA zero (entries with
    row+offset outside the matrix are zero by construction), so no
    masking is needed — and neither input nor output is ever copied for
    padding."""
    i = pl.program_id(0)
    win = T + L + R
    two = jnp.int32(2)

    def start_of(tile):
        s = jnp.maximum(tile * T - L, 0)
        # T, L and n_al - win are all multiples of 128; assert it for the
        # DMA slice (pure dynamic index — the hint survives here, unlike
        # dynamic+static compute slices, see the tile-class branches)
        return pl.multiple_of(jnp.minimum(s, n_al - win), 128)

    def copy(st, slot):
        return pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(st, win)],
            xwin.at[slot, :, pl.ds(L, win)], sems.at[slot],
        )

    @pl.when(i == 0)
    def _zero_guards():
        # guard zones written once; DMAs only ever touch [L, L+win)
        if L:
            xwin[:, :, pl.ds(0, L)] = jnp.zeros((2, 1, L), xwin.dtype)
        if R:
            xwin[:, :, pl.ds(L + win, R)] = jnp.zeros((2, 1, R), xwin.dtype)
        copy(start_of(jnp.int32(0)), jnp.int32(0)).start()

    @pl.when(i + 1 < ntiles)
    def _prefetch():
        copy(start_of(i + 1), jax.lax.rem(i + 1, two)).start()

    slot = jax.lax.rem(i, two)
    copy(start_of(i), slot).wait()

    # The window base (i*T - start) takes only THREE values: 0 on tile 0
    # (start clamped to 0), L on interior tiles, and L + R on the last
    # tile (start clamped to n_al - win; requires T >= L, R — enforced by
    # dia_padded_ok).  Mosaic cannot prove alignment of a dynamic lane
    # index plus a static unaligned offset, so branch on the tile class
    # and keep every slice start STATIC, like the fixed-window kernel.
    def accumulate(base):
        acc = jnp.zeros((1, T), data_ref.dtype)
        for k, d in enumerate(offsets):
            seg = xwin[slot, :, pl.ds(base + L + d, T)]
            acc = acc + data_ref[k, :].reshape(1, T) * seg
        y_ref[...] = acc

    last_base = L + R if ntiles > 1 else 0

    @pl.when(i == 0)
    def _first_tile():
        accumulate(0)

    if ntiles > 1:
        @pl.when(i == ntiles - 1)
        def _last_tile():
            accumulate(last_base)

    if ntiles > 2:
        @pl.when((i > 0) & (i < ntiles - 1))
        def _interior():
            accumulate(L)


def spmv_dia_padded(A: DiaMatrix, xp: jax.Array, *, tile: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """y = A @ x for x in the persistent padded layout: ``xp`` has length
    n_al (any common multiple of the participating operators' tiles,
    >= dia_padded_len(A)), rows [n, n_al) zero.  Returns y in the same
    layout (pad rows stay zero because the corresponding DIA data is
    zero).  No pad/unpad copies — the boundary handling lives in the
    kernel (see _kernel_padded)."""
    n, m = A.shape
    if n != m:
        raise ValueError("padded DIA spmv supports square operators")
    D = len(A.offsets)
    if tile is None:
        tile = _default_tile(D, A.data.dtype.itemsize)
    n_al = xp.shape[0]
    if n_al % tile:
        raise ValueError(
            f"padded vector length {n_al} is not a multiple of the "
            f"kernel tile {tile}"
        )
    L = -(-max(0, -min(A.offsets)) // 128) * 128
    R = -(-max(0, max(A.offsets)) // 128) * 128
    win = tile + L + R
    if n_al < win or tile < max(L, R):
        raise ValueError("operator too small for the padded kernel")
    dt = A.data.dtype
    xc = xp.astype(dt).reshape(1, -1)
    if A.data.shape[1] >= n_al:
        data = jax.lax.slice(A.data, (0, 0), (D, n_al))
    else:
        data = jnp.pad(A.data, ((0, 0), (0, n_al - A.data.shape[1])))
    ntiles = n_al // tile

    _imap = lambda i: (jnp.int32(0), i)
    y = pl.pallas_call(
        partial(_kernel_padded, A.offsets, L, R, tile, n_al, ntiles),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((D, tile), _imap),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, tile), _imap),
        out_shape=jax.ShapeDtypeStruct((1, n_al), dt),
        scratch_shapes=[
            pltpu.VMEM((2, 1, L + win + R), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, xc)
    return y[0].astype(xp.dtype)


# ----------------------------------------------------------------------
# block-DIA kernel
# ----------------------------------------------------------------------

def _block_kernel(offsets, L, T, b, bp, ntiles, data_ref, xp_ref, y_ref,
                  xwin, sems):
    """One block-row tile: double-buffered DMA of the (bp, window) x
    planes (bp = b padded to the 8-sublane tiling), then every block
    diagonal as unrolled b² lane-parallel multiply-adds."""
    i = pl.program_id(0)
    win = xwin.shape[2]
    two = jnp.int32(2)

    def copy(tile, slot):
        return pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(tile * T, win)],
            xwin.at[slot], sems.at[slot],
        )

    @pl.when(i == 0)
    def _first():
        copy(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + 1 < ntiles)
    def _prefetch():
        copy(i + 1, jax.lax.rem(i + 1, two)).start()

    slot = jax.lax.rem(i, two)
    copy(i, slot).wait()
    accs = [jnp.zeros((1, T), data_ref.dtype) for _ in range(b)]
    for k, d in enumerate(offsets):
        for a in range(b):
            acc = accs[a]
            for c in range(b):
                seg = xwin[slot, c, pl.ds(L + d, T)].reshape(1, T)
                acc = acc + data_ref[k, a, c, :].reshape(1, T) * seg
            accs[a] = acc
    zero = jnp.zeros((1, T), data_ref.dtype)
    y_ref[...] = jnp.concatenate(accs + [zero] * (bp - b), axis=0)


def spmv_block_dia_pallas(A: BlockDiaMatrix, x: jax.Array, *,
                          tile: int = 8192, interpret: bool = False):
    """y = A @ x for block-DIA matrices with the streaming kernel: the x
    planes enter VMEM once per row tile instead of once per diagonal."""
    n, m = A.shape
    if n != m:
        raise ValueError("pallas block-DIA spmv supports square operators")
    D, b, _, nb = A.data.shape
    bp = -(-b // 8) * 8                            # sublane-tiled planes
    L = -(-max(0, -min(A.offsets)) // 128) * 128
    R = -(-max(0, max(A.offsets)) // 128) * 128
    dt = A.data.dtype
    xc = x.astype(dt).reshape(nb, b).T            # (b, nb)

    nb_pad = ((nb + tile - 1) // tile) * tile
    xp = jnp.pad(xc, ((0, bp - b), (L, R + (nb_pad - nb))))
    data = (
        jnp.pad(A.data, ((0, 0), (0, 0), (0, 0), (0, nb_pad - nb)))
        if nb_pad != nb else A.data
    )
    ntiles = nb_pad // tile
    win = tile + L + R

    _imap4 = lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0), i)
    _imap2 = lambda i: (jnp.int32(0), i)
    y = pl.pallas_call(
        partial(_block_kernel, A.offsets, L, tile, b, bp, ntiles),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((D, b, b, tile), _imap4),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((bp, tile), _imap2),
        out_shape=jax.ShapeDtypeStruct((bp, nb_pad), dt),
        scratch_shapes=[
            pltpu.VMEM((2, bp, win), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, xp)
    return y[:b, :nb].T.reshape(-1).astype(x.dtype)


def prehalo_viable(D: int, H: int, itemsize: int = 4) -> bool:
    """VMEM feasibility of the pre-haloed kernel: double-buffered data
    blocks plus two halo windows must fit the ~16MB scoped budget."""
    budget = 4 << 20
    tile = max(8192, min((budget // (D * itemsize)) // 128 * 128, 131072))
    Lp = -(-H // 128) * 128
    win = tile + 2 * Lp
    need = 2 * D * tile * itemsize + 2 * win * itemsize
    return need <= (12 << 20)


def spmv_dia_prehalo_pallas(data: jax.Array, offsets, x_ext: jax.Array,
                            H: int, n_loc: int, *,
                            interpret: bool = False) -> jax.Array:
    """Streaming DIA SpMV for a *pre-haloed* local vector — the
    distributed per-shard compute path (parallel/dist.py DistDia):
    x_ext = [H left-halo | local | H right-halo] already assembled by the
    ppermute exchange; this reuses the double-buffered kernel with the
    halo re-padded to the 128-lane alignment the DMA needs."""
    dt = data.dtype
    D = data.shape[0]
    budget = 4 << 20
    tile = (budget // (D * dt.itemsize)) // 128 * 128
    tile = int(max(8192, min(tile, 131072)))
    Lp = -(-H // 128) * 128
    Rp = Lp
    n_pad = ((n_loc + tile - 1) // tile) * tile
    xp = jnp.pad(
        x_ext.astype(dt), (Lp - H, (Rp - H) + (n_pad - n_loc))
    ).reshape(1, -1)
    dpad = (
        jnp.pad(data, ((0, 0), (0, n_pad - n_loc)))
        if n_pad != n_loc else data
    )
    ntiles = n_pad // tile
    win = tile + Lp + Rp
    _imap = lambda i: (jnp.int32(0), i)
    y = pl.pallas_call(
        partial(_kernel, tuple(offsets), Lp, tile, ntiles),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((D, tile), _imap),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, tile), _imap),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), dt),
        scratch_shapes=[
            pltpu.VMEM((2, 1, win), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dpad, xp)
    return y[0, :n_loc]
