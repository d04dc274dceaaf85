"""Dense local rebinning ("reslot"): sort-free Verlet-list rebuilds.

The sort-based rebin (ops/binning.py) costs ~48 ms at 1M particles on a v5e
chip — argsort + rank scatter (~15 ms) and four particle->dense scatters
(~6 ms each) — because every element takes a random-access hop.  But between
deferred rebins the Verlet skin bounds displacement to less than one cell:
at rebin time every live particle's true cell is within +-1 of the cell of
the slot it already occupies (skin_half + one step's v*dt << cell_size).  So
the rebin is a LOCAL operation: each cell re-collects its occupants from its
3x3 slot neighbourhood and compacts them into its cap slots, entirely with
rolled dense views and select-accumulate — zero sorts, zero scatters, zero
gathers, fully VPU-vectorized.  Measured at 1M: ~1 ms (Pallas) vs 48 ms.

Mechanics, per target cell: enumerate the 72 candidate slots (3x3
neighbour cells x cap) in a fixed order; a candidate MATCHES if it is live
(non-FAR) and its position falls in the target cell (same clipped-cell
convention as ops/binning.cell_coords, with the clip gated on liveness so
the FAR sentinel can never clamp into a boundary cell).  A running per-cell
match count assigns each matching candidate a rank; candidate values write
into output slot k through the one-hot mask (rank == k), giving a
deterministic within-cell order (candidate enumeration order).  Matches
beyond cap are counted as overflow (dropped, same semantics as the sorting
path); the per-cell counts come back so callers can also detect ``lost``
particles (live slots captured by no cell — impossible while the skin
invariant holds; surfaced as a diagnostic rather than assumed).

The particle identity needed to restore original-order FluidStates rides
along as a dense int32 index field (idx_d, -1 = empty), so the solver never
maintains per-particle slot maps between rebins; extraction scatters
dense -> [N] on demand (~2.5 ms at 1M, and only when a FluidState is
actually requested).

The reference has no analog of any of this — it rebuilt its grid from
scratch every frame with an 8-pass atomic counting sort (reference:
assets/shaders/grid_build.wgsl, src/gpu/grid_build.rs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import GridSpec2D
from .binning import FAR

OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _occ_row(xd: jax.Array, grid: GridSpec2D) -> jax.Array:
    """Max occupied slot index + 1 per cell row [ny_pad], read off the FAR
    sentinel (works for any dense position field; one fused reduction,
    ~0.04 ms at 1M)."""
    return jnp.max(
        jnp.where(xd < FAR * 0.5,
                  jnp.arange(grid.cap, dtype=jnp.int32)[None, :, None] + 1,
                  0), axis=(1, 2))


def block_kmax3(xd: jax.Array, grid: GridSpec2D) -> jax.Array:
    """Per-row-block, per-row-shift slot-loop bounds [3, n_row_blocks].

    ``out[1 + dy, r]`` bounds the occupied slots of the j-rows a stencil
    program r reads at row shift dy — the EXACT tb-row window
    [(r+1)*tb + dy, (r+1)*tb + dy + tb), not whole neighbouring blocks — so
    surface/boundary blocks whose sparse side sits in a different shift
    don't pay the dense side's occupancy.  Shared by the solver stencils
    and the reslot kernel (all three bound their per-dy kj loops with it)."""
    occ_row = _occ_row(xd, grid)
    tb = grid.row_block
    nb = grid.n_row_blocks
    pad = jnp.concatenate([occ_row,
                           jnp.zeros((tb,), dtype=occ_row.dtype)])
    # wmax[s] = max(occ_row[s : s + tb])
    wmax = jnp.max(jnp.stack([pad[i:i + occ_row.shape[0]]
                              for i in range(tb)]), axis=0)
    starts = (jnp.arange(nb, dtype=jnp.int32) + 1) * tb
    return jnp.stack([wmax[starts - 1], wmax[starts],
                      wmax[starts + 1]]).astype(jnp.int32)


# ---------------------------------------------------------------------------
# XLA implementation (any backend; the CI reference)
# ---------------------------------------------------------------------------

def _cell_of(x, y, grid: GridSpec2D, live, clip_lo, clip_hi, origin):
    """Clipped cell coords of candidate positions, -9 for dead slots (the
    clip alone would resurrect FAR into the boundary cells).  The x-clip
    range is a parameter: single-chip uses [0, nx-1]; the sharded solver
    widens to [-1, nx] so slab-exits are CAPTURED into the ghost columns
    for migration instead of clamped into edge cells.  ``origin`` may be
    traced (the sharded solver passes the per-device slab origin)."""
    inv = 1.0 / grid.cell_size
    ox, oy = origin
    cx = jnp.floor((x - ox) * inv).astype(jnp.int32)
    cy = jnp.floor((y - oy) * inv).astype(jnp.int32)
    cx = jnp.where(live, jnp.clip(cx, clip_lo, clip_hi), -9)
    cy = jnp.where(live, jnp.clip(cy, 0, grid.ny - 1), -9)
    return cx, cy


def reslot_xla(xd, yd, vxd, vyd, idx_d, grid: GridSpec2D,
               clip_lo: int = 0, clip_hi: int | None = None, origin=None):
    """Dense local rebin with plain XLA ops (rolled views).

    Returns (xd, yd, vxd, vyd, idx_d, counts) where counts[y, x] is the
    number of matching candidates per dense cell (cap overflow visible as
    counts > cap).  Candidate enumeration order is (kj, dx, dy) — the SAME
    as the Pallas kernel, so the two produce identical slot assignments."""
    if clip_hi is None:
        clip_hi = grid.nx - 1
    if origin is None:
        origin = (grid.origin_x, grid.origin_y)
    cap = grid.cap
    shape = xd.shape
    # target cell coords per dense position: lane l -> cx = l-1,
    # row r -> cy = r - row0 (ghosts get unreachable negatives/overlarge)
    tgt_cx = (jnp.arange(shape[2], dtype=jnp.int32) - 1)[None, None, :]
    tgt_cy = (jnp.arange(shape[0], dtype=jnp.int32) - grid.row0)[:, None,
                                                                 None]
    kiota = jnp.arange(cap, dtype=jnp.int32)[None, :, None]

    out_x = jnp.full(shape, FAR, jnp.float32)
    out_y = jnp.full(shape, FAR, jnp.float32)
    out_vx = jnp.zeros(shape, jnp.float32)
    out_vy = jnp.zeros(shape, jnp.float32)
    out_i = jnp.full(shape, -1, jnp.int32)
    cnt = jnp.zeros((shape[0], 1, shape[2]), jnp.int32)

    for kj in range(cap):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx_ = jnp.roll(xd[:, kj:kj + 1, :], (-dy, -dx), (0, 2))
                cy_ = jnp.roll(yd[:, kj:kj + 1, :], (-dy, -dx), (0, 2))
                live = cx_ < FAR * 0.5
                ccx, ccy = _cell_of(cx_, cy_, grid, live, clip_lo, clip_hi,
                                    origin)
                match = (ccx == tgt_cx) & (ccy == tgt_cy)
                sel = match & (cnt == kiota)      # one-hot over slot dim
                out_x = jnp.where(sel, cx_, out_x)
                out_y = jnp.where(sel, cy_, out_y)
                out_vx = jnp.where(
                    sel, jnp.roll(vxd[:, kj:kj + 1, :], (-dy, -dx), (0, 2)),
                    out_vx)
                out_vy = jnp.where(
                    sel, jnp.roll(vyd[:, kj:kj + 1, :], (-dy, -dx), (0, 2)),
                    out_vy)
                out_i = jnp.where(
                    sel, jnp.roll(idx_d[:, kj:kj + 1, :], (-dy, -dx), (0, 2)),
                    out_i)
                cnt = cnt + match.astype(jnp.int32)

    return out_x, out_y, out_vx, out_vy, out_i, cnt[:, 0, :]


# ---------------------------------------------------------------------------
# Pallas TPU kernel (same halo-DMA stencil shape as the solver kernels)
# ---------------------------------------------------------------------------

def _copy_slab(hbm_ref, scratch_ref, sem, row_start, rows):
    return pltpu.make_async_copy(
        hbm_ref.at[pl.ds(row_start, rows)], scratch_ref, sem)


def _cnt_rows(tb: int) -> int:
    """Sublane height of the per-cell count output block.  The count plane
    is 2D, so the block's ROW dim (not cap) sits in Mosaic's sublane slot
    and must be divisible by 8 — a (tb, nx_pad) block faults the lowering
    at tb=4 (the >6016-lane wide-grid row blocks).  Counts are therefore
    emitted as [n_row_blocks, _cnt_rows(tb), nx_pad] (block = the full
    last-two dims, legal for any tb) and re-laid to [ny_pad, nx_pad] on
    the host side by _cnt_plane."""
    return max(8, tb)


def _emit_cnt(cnt_ref, cnt, tb: int):
    """Store the (tb, 1, nx_pad) running count into the padded
    (1, _cnt_rows, nx_pad) output block."""
    rows = cnt[:, 0, :]
    tbs = cnt_ref.shape[1]
    if tbs > tb:
        rows = jnp.concatenate(
            [rows, jnp.zeros((tbs - tb, rows.shape[1]), rows.dtype)], axis=0)
    cnt_ref[...] = rows[None]


def _cnt_plane(cnt3, grid: GridSpec2D, ny_pad: int):
    """[n_row_blocks, _cnt_rows, nx_pad] -> [ny_pad, nx_pad] with zeroed
    ghost row blocks (the grid only writes interior blocks)."""
    tb = grid.row_block
    interior = cnt3[:, :tb, :].reshape(-1, grid.nx_pad)
    return jnp.zeros((ny_pad, grid.nx_pad), cnt3.dtype).at[
        tb:tb + interior.shape[0]].set(interior)


def _reslot_kernel(pr, occ, x_hbm, y_hbm, vx_hbm, vy_hbm, i_hbm,
                   ox_ref, oy_ref, ovx_ref, ovy_ref, oi_ref, cnt_ref,
                   xs, ys, vxs, vys, is_, sems, *, tb, grid: GridSpec2D,
                   clip_lo: int, clip_hi: int):
    r = pl.program_id(0)
    row_start = (r + 1) * tb - 1
    copies = [
        _copy_slab(x_hbm, xs, sems.at[0], row_start, tb + 2),
        _copy_slab(y_hbm, ys, sems.at[1], row_start, tb + 2),
        _copy_slab(vx_hbm, vxs, sems.at[2], row_start, tb + 2),
        _copy_slab(vy_hbm, vys, sems.at[3], row_start, tb + 2),
        _copy_slab(i_hbm, is_, sems.at[4], row_start, tb + 2),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    inv = pr[0, 0]      # 1 / cell_size
    ox = pr[0, 1]
    oy = pr[0, 2]
    cap = xs.shape[1]
    nxp = xs.shape[2]

    # target cell coords of this block's rows/lanes
    tgt_cx = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, nxp), 2) - 1
    abs_row = (r + 1) * tb + jax.lax.broadcasted_iota(
        jnp.int32, (tb, 1, nxp), 0)
    tgt_cy = abs_row - grid.row0
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)

    # outputs accumulate IN the output refs (read-modify-write per
    # iteration); only the small per-cell running count rides the fori
    # carry — carrying six [tb, cap, nxp] arrays through fori_loop costs a
    # VMEM copy per value per iteration and dominated the kernel
    ox_ref[...] = jnp.full((tb, cap, nxp), FAR, jnp.float32)
    oy_ref[...] = jnp.full((tb, cap, nxp), FAR, jnp.float32)
    ovx_ref[...] = jnp.zeros((tb, cap, nxp), jnp.float32)
    ovy_ref[...] = jnp.zeros((tb, cap, nxp), jnp.float32)
    oi_ref[...] = jnp.full((tb, cap, nxp), -1, jnp.int32)
    cnt = jnp.zeros((tb, 1, nxp), jnp.int32)

    def roll(a, dx):
        return a if dx == 0 else jnp.roll(a, -dx, axis=-1)

    def shift(a, dy):
        # leading-dim (untiled) row view: free
        return jax.lax.slice_in_dim(a, 1 + dy, 1 + dy + tb, axis=0)

    # kj OUTER, (kj, dx, dy) candidate order — matches reslot_xla; one
    # dynamic sublane read per field per j slot, rolls shared across the
    # three row shifts
    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    def body(kj, cnt):
        xkf = xs[:, pl.ds(kj, 1), :]
        ykf = ys[:, pl.ds(kj, 1), :]
        vxkf = vxs[:, pl.ds(kj, 1), :]
        vykf = vys[:, pl.ds(kj, 1), :]
        ikf = is_[:, pl.ds(kj, 1), :]
        for dx in (-1, 0, 1):
            rxf, ryf = roll(xkf, dx), roll(ykf, dx)
            rvxf, rvyf = roll(vxkf, dx), roll(vykf, dx)
            rif = roll(ikf, dx)
            for dy in (-1, 0, 1):
                cx_ = shift(rxf, dy)
                cy_ = shift(ryf, dy)
                live = cx_ < FAR * 0.5
                ccx = jnp.floor((cx_ - ox) * inv).astype(jnp.int32)
                ccy = jnp.floor((cy_ - oy) * inv).astype(jnp.int32)
                ccx = jnp.where(live, jnp.clip(ccx, clip_lo, clip_hi), -9)
                ccy = jnp.where(live, jnp.clip(ccy, 0, grid.ny - 1), -9)
                match = (ccx == tgt_cx) & (ccy == tgt_cy)
                sel = match & (cnt == kiota)
                ox_ref[...] = jnp.where(sel, cx_, ox_ref[...])
                oy_ref[...] = jnp.where(sel, cy_, oy_ref[...])
                ovx_ref[...] = jnp.where(sel, shift(rvxf, dy), ovx_ref[...])
                ovy_ref[...] = jnp.where(sel, shift(rvyf, dy), ovy_ref[...])
                oi_ref[...] = jnp.where(sel, shift(rif, dy), oi_ref[...])
                cnt = cnt + match.astype(jnp.int32)
        return cnt
    cnt = jax.lax.fori_loop(0, kmax, body, cnt)

    _emit_cnt(cnt_ref, cnt, tb)


def reslot_pallas(xd, yd, vxd, vyd, idx_d, grid: GridSpec2D,
                  interpret: bool | None = None,
                  clip_lo: int = 0, clip_hi: int | None = None, origin=None):
    """Fused dense local rebin; same contract as reslot_xla."""
    if interpret is None:
        interpret = _interpret_default()
    if clip_hi is None:
        clip_hi = grid.nx - 1
    if origin is None:
        origin = (grid.origin_x, grid.origin_y)
    tb = grid.row_block
    kernel = functools.partial(_reslot_kernel, tb=tb, grid=grid,
                               clip_lo=clip_lo, clip_hi=clip_hi)
    fshape = jax.ShapeDtypeStruct(xd.shape, jnp.float32)
    ishape = jax.ShapeDtypeStruct(xd.shape, jnp.int32)
    cshape = jax.ShapeDtypeStruct(
        (grid.n_row_blocks, _cnt_rows(tb), grid.nx_pad), jnp.int32)
    block = pl.BlockSpec((tb, grid.cap, grid.nx_pad), lambda r: (r + 1, 0, 0))
    cblock = pl.BlockSpec((1, _cnt_rows(tb), grid.nx_pad),
                          lambda r: (r, 0, 0))
    slab_f = pltpu.VMEM((tb + 2, grid.cap, grid.nx_pad), jnp.float32)
    slab_i = pltpu.VMEM((tb + 2, grid.cap, grid.nx_pad), jnp.int32)
    params = jnp.stack([
        1.0 / jnp.float32(grid.cell_size),
        jnp.asarray(origin[0], jnp.float32),
        jnp.asarray(origin[1], jnp.float32),
        0.0, 0.0, 0.0, 0.0, 0.0]).reshape(1, 8)
    occ = block_kmax3(xd, grid)
    ox, oy, ovx, ovy, oi, cnt = pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=[pl.BlockSpec((1, 8), lambda r: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=(block, block, block, block, block, cblock),
        out_shape=(fshape, fshape, fshape, fshape, ishape, cshape),
        scratch_shapes=[slab_f] * 4 + [slab_i]
        + [pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, occ, xd, yd, vxd, vyd, idx_d)

    # The grid writes interior blocks only; the outer ghost blocks (first and
    # last row_block rows) must still hold the empty-slot fills — solver
    # reductions span the whole array, the next reslot reads them as
    # candidates, and interpret mode would otherwise leave NaN there.
    tb = grid.row_block

    def fill(a, v):
        return a.at[:tb].set(v).at[-tb:].set(v)
    return (fill(ox, FAR), fill(oy, FAR), fill(ovx, 0.0), fill(ovy, 0.0),
            fill(oi, -1), _cnt_plane(cnt, grid, xd.shape[0]))


# ---------------------------------------------------------------------------
# PLANAR reslot: plane-at-a-time rebin for HBM-ceiling particle counts
# ---------------------------------------------------------------------------
#
# The fused kernel above holds 5 input + 5 output dense planes alive at once;
# with the solver's 8 resident planes that is ~13 plane-footprints at the
# rebin peak — the observed 128M-particle HBM fault (BASELINE.json
# round3_memory_ceiling).  The planar pipeline splits the rebin into:
#
#   1. SELECT: one kernel reads ONLY x/y and emits a routing CODE plane —
#      code[r, k, c] encodes which candidate slot (dy, dx, kj) of the 3x3
#      window feeds output slot (r, k, c) (-1 = empty) — plus the per-cell
#      match counts.  The code is the entire rebin decision; it is a pure
#      function of positions, so payload planes are untouched here.
#   2. APPLY, once per payload plane: a cheap gather kernel routes ONE plane
#      through the code.  Between applies the consumed input plane is dead,
#      so XLA's buffer reuse keeps the peak at (live inputs + code + one
#      output in flight) instead of (all inputs + all outputs).
#
# Slot assignments are IDENTICAL to the fused kernel (same candidate
# enumeration order, same one-hot rank rule — the code plane just makes the
# decision explicit instead of consuming it in-kernel).  Per-rebin cost is
# slightly higher (6 launches vs 1; the match arithmetic runs once but the
# select/compare loop runs per plane), which is noise at the scales that
# need this: rebins fire ~1/18 steps and the planar path is only selected
# near the HBM ceiling (see verlet_solver.Session planar_rebin).

_CODE_EMPTY = -1

# Routing-code element type.  Codes span [-1, cap*9) = [-1, 72) and fit
# int8: a 4x narrower code plane sheds ~1.4 GiB of the rotated rebin's
# TEMP at 208M — the select code plane is the one plane-sized temp with
# no donor left (the 224M single-chip and 160M/device sharded brackets
# both die on it).  Env-gated (BGF_CODE8=1) until the Mosaic int8
# select/compare lowering is hardware-proven; routing decisions are
# identical either way (tests/test_planar.py pins the pipelines
# bitwise).
import os as _os
CODE_DTYPE = jnp.int8 if _os.environ.get("BGF_CODE8") == "1" else jnp.int32


def _code_of(kj, dx: int, dy: int):
    """Routing code of candidate (kj, dx, dy) — candidate enumeration order
    (kj outer, then dx, then dy) matches _reslot_kernel/reslot_xla."""
    return kj * 9 + (dx + 1) * 3 + (dy + 1)


def _select_kernel(pr, occ, x_hbm, y_hbm, code_ref, cnt_ref,
                   xs, ys, sems, *, tb, grid: GridSpec2D,
                   clip_lo: int, clip_hi: int):
    r = pl.program_id(0)
    row_start = (r + 1) * tb - 1
    copies = [
        _copy_slab(x_hbm, xs, sems.at[0], row_start, tb + 2),
        _copy_slab(y_hbm, ys, sems.at[1], row_start, tb + 2),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    inv = pr[0, 0]
    ox = pr[0, 1]
    oy = pr[0, 2]
    cap = xs.shape[1]
    nxp = xs.shape[2]

    tgt_cx = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, nxp), 2) - 1
    abs_row = (r + 1) * tb + jax.lax.broadcasted_iota(
        jnp.int32, (tb, 1, nxp), 0)
    tgt_cy = abs_row - grid.row0
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)

    code_ref[...] = jnp.full((tb, cap, nxp), _CODE_EMPTY, code_ref.dtype)
    cnt = jnp.zeros((tb, 1, nxp), jnp.int32)

    def roll(a, dx):
        return a if dx == 0 else jnp.roll(a, -dx, axis=-1)

    def shift(a, dy):
        return jax.lax.slice_in_dim(a, 1 + dy, 1 + dy + tb, axis=0)

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    def body(kj, cnt):
        xkf = xs[:, pl.ds(kj, 1), :]
        ykf = ys[:, pl.ds(kj, 1), :]
        for dx in (-1, 0, 1):
            rxf, ryf = roll(xkf, dx), roll(ykf, dx)
            for dy in (-1, 0, 1):
                cx_ = shift(rxf, dy)
                cy_ = shift(ryf, dy)
                live = cx_ < FAR * 0.5
                ccx = jnp.floor((cx_ - ox) * inv).astype(jnp.int32)
                ccy = jnp.floor((cy_ - oy) * inv).astype(jnp.int32)
                ccx = jnp.where(live, jnp.clip(ccx, clip_lo, clip_hi), -9)
                ccy = jnp.where(live, jnp.clip(ccy, 0, grid.ny - 1), -9)
                match = (ccx == tgt_cx) & (ccy == tgt_cy)
                sel = match & (cnt == kiota)
                code_ref[...] = jnp.where(
                    sel,
                    jnp.asarray(_code_of(kj, dx, dy), code_ref.dtype),
                    code_ref[...])
                cnt = cnt + match.astype(jnp.int32)
        return cnt
    cnt = jax.lax.fori_loop(0, kmax, body, cnt)
    _emit_cnt(cnt_ref, cnt, tb)


def select_pallas(xd, yd, grid: GridSpec2D, interpret: bool | None = None,
                  clip_lo: int = 0, clip_hi: int | None = None, origin=None,
                  occ=None):
    """Planar-rebin phase 1: the routing decision.  Returns (code, cnt) where
    code is int32[ny_pad, cap, nx_pad] (see _code_of; -1 = empty) and cnt is
    the same per-cell match count reslot_pallas returns."""
    if interpret is None:
        interpret = _interpret_default()
    if clip_hi is None:
        clip_hi = grid.nx - 1
    if origin is None:
        origin = (grid.origin_x, grid.origin_y)
    tb = grid.row_block
    kernel = functools.partial(_select_kernel, tb=tb, grid=grid,
                               clip_lo=clip_lo, clip_hi=clip_hi)
    ishape = jax.ShapeDtypeStruct(xd.shape, CODE_DTYPE)
    cshape = jax.ShapeDtypeStruct(
        (grid.n_row_blocks, _cnt_rows(tb), grid.nx_pad), jnp.int32)
    block = pl.BlockSpec((tb, grid.cap, grid.nx_pad), lambda r: (r + 1, 0, 0))
    cblock = pl.BlockSpec((1, _cnt_rows(tb), grid.nx_pad),
                          lambda r: (r, 0, 0))
    slab = pltpu.VMEM((tb + 2, grid.cap, grid.nx_pad), jnp.float32)
    params = jnp.stack([
        1.0 / jnp.float32(grid.cell_size),
        jnp.asarray(origin[0], jnp.float32),
        jnp.asarray(origin[1], jnp.float32),
        0.0, 0.0, 0.0, 0.0, 0.0]).reshape(1, 8)
    if occ is None:
        occ = block_kmax3(xd, grid)
    code, cnt = pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=[pl.BlockSpec((1, 8), lambda r: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(block, cblock),
        out_shape=(ishape, cshape),
        scratch_shapes=[slab, slab, pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, occ, xd, yd)
    tb = grid.row_block
    code = code.at[:tb].set(_CODE_EMPTY).at[-tb:].set(_CODE_EMPTY)
    return code, _cnt_plane(cnt, grid, xd.shape[0])


def _apply_kernel(occ, code_ref, p_hbm, out_ref, psl, sems, *, tb, fill):
    r = pl.program_id(0)
    row_start = (r + 1) * tb - 1
    c = _copy_slab(p_hbm, psl, sems.at[0], row_start, tb + 2)
    c.start()
    c.wait()

    # int8 code: one widening convert per block, then identical compares
    code = code_ref[...].astype(jnp.int32)
    out_ref[...] = jnp.full(out_ref.shape, fill, out_ref.dtype)

    def roll(a, dx):
        return a if dx == 0 else jnp.roll(a, -dx, axis=-1)

    def shift(a, dy):
        return jax.lax.slice_in_dim(a, 1 + dy, 1 + dy + tb, axis=0)

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    def body(kj, _):
        pkf = psl[:, pl.ds(kj, 1), :]
        for dx in (-1, 0, 1):
            rpf = roll(pkf, dx)
            for dy in (-1, 0, 1):
                sel = code == _code_of(kj, dx, dy)
                out_ref[...] = jnp.where(sel, shift(rpf, dy), out_ref[...])
        return 0
    jax.lax.fori_loop(0, kmax, body, 0)


def apply_code_pallas(payload, code, occ, grid: GridSpec2D, fill,
                      interpret: bool | None = None, out=None):
    """Planar-rebin phase 2: route ONE payload plane through the code.
    ``occ`` is the pre-rebin block_kmax3 (bounds source kj; code never
    references a slot past it).  Ghost blocks come back as ``fill``.

    ``out`` optionally supplies a DEAD plane (same shape/dtype) whose
    buffer the output is written over (``input_output_aliases``, the
    density ``rho_out`` pattern).  The kernel never reads it.  This is
    the HBM-ceiling donor chain: a must-alias pairing of an apply's
    output onto its OWN payload buffer is illegal (the halo-slab DMA
    reads neighbour rows a self-overwrite would corrupt), which XLA
    resolves with a full-plane input copy — 2-4 copied planes were the
    192M rebin RESOURCE_EXHAUSTED.  Chaining each apply into the
    PREVIOUS plane's dead buffer (seeded by the dead rho plane) needs no
    copies at all."""
    if interpret is None:
        interpret = _interpret_default()
    tb = grid.row_block
    kernel = functools.partial(_apply_kernel, tb=tb, fill=fill)
    block = pl.BlockSpec((tb, grid.cap, grid.nx_pad), lambda r: (r + 1, 0, 0))
    slab = pltpu.VMEM((tb + 2, grid.cap, grid.nx_pad), payload.dtype)
    in_specs = [pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                             memory_space=pltpu.SMEM),
                block,
                pl.BlockSpec(memory_space=pl.ANY)]
    operands = [occ, code, payload]
    alias = {}
    if out is not None:
        inner = kernel
        kernel = lambda oc, cr, ph, _dead, out_ref, psl, sems: \
            inner(oc, cr, ph, out_ref, psl, sems)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(out)
        alias = {3: 0}
    out_arr = pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=in_specs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(payload.shape, payload.dtype),
        scratch_shapes=[slab, pltpu.SemaphoreType.DMA((1,))],
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out_arr.at[:tb].set(fill).at[-tb:].set(fill)


def taken_mask(code: jax.Array, cap: int) -> jax.Array:
    """Per SOURCE slot: was it routed anywhere by this code plane?
    (True = some target cell collected it.)  The planar-path replacement
    for the fused recovery's pre-vs-post idx window compare — reads only
    the code plane, so the payload planes need not be kept alive.  Same
    fori-over-shifts + broadcast-any memory shape that fixed the >96M
    recovery fault (see verlet_solver._spill_recover)."""
    R, _, C = code.shape
    kiota = jnp.arange(cap, dtype=jnp.int32)[None, :, None]

    def _body(k, taken):
        # Per TARGET slot k: slice its [R,1,C] code plane, halo-pad only
        # that slice, and test the 9 shifted windows; win[rs, 0, cs] =
        # code[rs + s//3 - 1, k, cs + s%3 - 1]: the code of target slot
        # (rs+dy, k, cs+dx).  It routed source (rs, kj, cs) iff it equals
        # _code_of(kj, -dx, -dy) — the code encodes the offset FROM target
        # TO source, so enc = kj*9 + (2 - s%3)*3 + (2 - s//3).  Slicing the
        # slot BEFORE padding keeps every temp <= plane-sized ([R,cap,C]
        # bool accumulator, [R,1,C] int32 slices): a full-plane halo pad
        # (+ its remat copy) was ~2.8 GiB of the rebin dispatch's HLO
        # temps at 160M — the difference between the planar rebin fitting
        # HBM (~13.9 GiB) and faulting (16.74 GiB measured).  The earlier
        # 4D [R,cap,cap,C] broadcast-any was worse still (~2.2 GiB static
        # conditional-arena at 128M).
        slot = jax.lax.dynamic_slice(code, (0, k, 0), (R, 1, C))
        pslot = jnp.pad(slot, ((1, 1), (0, 0), (1, 1)),
                        constant_values=_CODE_EMPTY)

        # fori over the 9 shifted windows (NOT a python unroll): buffer
        # assignment gave every unrolled window slice its own [R, 1, C]
        # temp (~10 x 213 MB live at once at 192M — the bulk of the
        # rotated rebin's conditional arena); the loop bounds liveness to
        # one window slice per iteration
        def _shift(s, tk):
            sy = s // 3
            sx = s - sy * 3
            win = jax.lax.dynamic_slice(pslot, (sy, 0, sx), (R, 1, C))
            enc = kiota * 9 + (2 - sx) * 3 + (2 - sy)
            return tk | (win == enc)

        return jax.lax.fori_loop(0, 9, _shift, taken)

    return jax.lax.fori_loop(0, cap, _body,
                             jnp.zeros(code.shape, bool))


def reslot_planar(xd, yd, vxd, vyd, idx_d, grid: GridSpec2D,
                  interpret: bool | None = None,
                  clip_lo: int = 0, clip_hi: int | None = None, origin=None):
    """Plane-at-a-time dense local rebin; same contract (and bit-identical
    outputs) as reslot_pallas, but the rebin never holds more than one
    payload input + one payload output alive at a time."""
    occ = block_kmax3(xd, grid)
    code, cnt = select_pallas(xd, yd, grid, interpret, clip_lo, clip_hi,
                              origin, occ=occ)
    ox = apply_code_pallas(xd, code, occ, grid, FAR, interpret)
    oy = apply_code_pallas(yd, code, occ, grid, FAR, interpret)
    ovx = apply_code_pallas(vxd, code, occ, grid, 0.0, interpret)
    ovy = apply_code_pallas(vyd, code, occ, grid, 0.0, interpret)
    oi = apply_code_pallas(idx_d, code, occ, grid, -1, interpret)
    return ox, oy, ovx, ovy, oi, cnt


def make_reslot(grid: GridSpec2D, use_pallas: bool = True,
                interpret: bool | None = None,
                clip_lo: int = 0, clip_hi: int | None = None):
    """Returns reslot(xd, yd, vxd, vyd, idx_d, origin=None) ->
    (xd, yd, vxd, vyd, idx_d, counts).  ``origin`` overrides the grid's
    world origin (traced OK — the sharded solver passes the per-device
    slab origin)."""
    if use_pallas:
        def fn(xd, yd, vxd, vyd, idx_d, origin=None):
            return reslot_pallas(xd, yd, vxd, vyd, idx_d, grid, interpret,
                                 clip_lo, clip_hi, origin)
    else:
        def fn(xd, yd, vxd, vyd, idx_d, origin=None):
            return reslot_xla(xd, yd, vxd, vyd, idx_d, grid,
                              clip_lo, clip_hi, origin)
    return fn
