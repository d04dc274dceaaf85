"""Deferred-rebinning solver: Verlet skin over the dense cell grid.

The fastest single-chip path.  Binning (sort + scatters + gathers) is the
step's dominant cost at 1M particles — all random-access, ~15 ns/element on
TPU.  This solver amortizes it with the classic molecular-dynamics "Verlet
list skin": bin into cells of ``cell_size = skin_factor * h`` (skin_factor >
1), FREEZE the slot assignment, and keep the state *dense* between rebins —
integration happens elementwise on the dense arrays, and the stencil kernels
re-read current positions from the same frozen slots.  A rebin triggers (via
``lax.cond``) only when some particle has moved more than half the skin
``(cell_size - h) / 2`` since the last bin, which is exactly the condition
under which the frozen 3x3 window is still a superset of every true r < h
neighbourhood — the r^2 < h^2 gate does the final selection, so results are
IDENTICAL to rebinning every step (up to f32 summation order).

Between rebins a step costs: the density kernel + the FUSED
forces+integrate+trigger kernel (round 3) — accelerations never reach HBM,
the bounce box applies in-register, and the skin-displacement max is a
per-block scalar the kernel epilogue writes (the trigger reads it next
step; no full-array reduction).  No sorts, no scatters, no gathers.

Round-2 upgrade: the rebin itself is now ALSO sort/scatter/gather-free.
The same skin bound that freezes the window means a particle's true cell at
rebin time is within +-1 of its slot cell, so rebinning is local: the
``ops/reslot.py`` kernel re-collects each cell's occupants from its 3x3 slot
neighbourhood with pure VPU select-accumulate (~1 ms at 1M vs ~48 ms for the
sorting path).  Particle identity rides in a dense int32 index field; the
per-particle FluidState is materialized only on demand (one dense->[N]
scatter at multi_step exit), never per step.

The reference has no analog — it rebuilt the full grid (GPU 8-pass +
CPU CSR) every frame (reference: src/gpu/buffers.rs:291-298,
assets/shaders/grid_build.wgsl).

Empty-slot handling: FAR slots must stay FAR through integration (otherwise
the bounce box would clamp them onto the walls as phantom particles), so all
dense integration is masked by x < FAR/2.

Degradation + RECOVERY semantics (see tests/test_overflow.py): particles
beyond a cell's ``cap`` at a bin/rebin lose their slot and are counted
(cumulatively) in ``overflow`` — but they are not gone: they move to a
fixed-size SPILL buffer (positions/velocities frozen, no forces felt), and
every subsequent rebin attempts re-admission into their target cell if
capacity has freed up (transient compression is the common overflow cause —
the fluid moves on and the cell re-opens) and the entry satisfies the skin
invariant (|v| dt <= skin_half — ballistic window-lost runaways stay
suspended; see ``_spill_recover``).  Re-admissions are counted in
``readmitted``; suspended particles surface in extracted states at their
frozen positions (not FAR), so nothing teleports.  The recovery path is
entirely inside a ``lax.cond`` whose predicate is false in overflow-0
scenes — the standard-scene step cost is unchanged.  Spill capacity is
best-effort: drops beyond ``spill_cap`` free slots are permanently lost
(still counted in ``overflow``).  ``lost`` counts particles missed by the
+-1 reslot window, which is impossible while the skin invariant holds; it
exists so a violation would be loudly visible rather than silent.

(The reference has no recovery story at all — its atomic grid builder
silently clamps overfull cells, reference: assets/shaders/grid_build.wgsl:
57-66; the eager solvers here keep overflowed particles integrating under
a gravity-only fallback instead, models/grid_solver.py.)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, IntegrateConfig, GridSpec2D, GRAVITY_Y
from ..core.state import FluidState
from ..ops.binning import FAR, bin_particles, cell_coords, to_dense
from ..ops.kernels import eos_pressure, self_density
from ..ops import reslot as reslot_ops
from . import grid_solver, pallas_solver


SPILL_CAP = 256  # default spill-buffer entries (recovery pool size)


@partial(jax.tree_util.register_dataclass,
         data_fields=("xd", "yd", "vxd", "vyd", "rho_d", "ref_xd", "ref_yd",
                      "idx_d", "occ", "disp2", "age", "overflow", "lost",
                      "rebin_count", "step", "sx", "sy", "svx", "svy",
                      "sidx", "readmitted"),
         meta_fields=())
@dataclasses.dataclass
class DenseSim:
    """Dense-resident simulation state between rebins.

    xd/yd/vxd/vyd: float32[ny_pad, cap, nx_pad] current fields (FAR = empty)
    rho_d:         density at the last step's PRE-integrate positions — the
                   same convention as the reference's stored rho (its step
                   runs density first, src/cpu/sph2d.rs:222-227)
    ref_xd/ref_yd: positions at the last rebin (for the skin trigger)
    idx_d:         int32[ny_pad, cap, nx_pad] original particle index per
                   slot (-1 = empty) — identity for on-demand extraction
    occ:           int32[3, n_row_blocks] cached block_kmax3 slot-loop
                   bounds — the occupancy pattern is a function of the slot
                   structure, which is FROZEN between rebins, so it is
                   computed once per rebin instead of per kernel call
                   (saves two full-array reductions per step)
    disp2:         f32 scalar: max squared displacement from the rebin
                   reference, computed at the END of the previous step
                   (in-kernel on the fused path) — the rebin trigger reads
                   it instead of re-reducing the dense arrays; identical
                   value by construction (same positions, same reference)
    age:           int32 steps since last rebin
    overflow:      int32 cumulative particles dropped to cell capacity
    lost:          int32 cumulative particles missed by the reslot window
                   (0 by the skin invariant; a diagnostic, not a tolerance)
    rebin_count:   int32
    step:          int32
    sx/sy/svx/svy: float32[spill_cap] SPILL buffer — frozen state of
                   capacity-dropped particles awaiting re-admission
                   (FAR/0 = empty entry)
    sidx:          int32[spill_cap] original particle index per spill entry
                   (-1 = empty)
    readmitted:    int32 cumulative spill re-admissions (recovered drops)
    """

    xd: jax.Array
    yd: jax.Array
    vxd: jax.Array
    vyd: jax.Array
    rho_d: jax.Array
    ref_xd: jax.Array
    ref_yd: jax.Array
    idx_d: jax.Array
    occ: jax.Array
    disp2: jax.Array
    age: jax.Array
    overflow: jax.Array
    lost: jax.Array
    rebin_count: jax.Array
    step: jax.Array
    sx: jax.Array
    sy: jax.Array
    svx: jax.Array
    svy: jax.Array
    sidx: jax.Array
    readmitted: jax.Array

    @property
    def suspended(self) -> jax.Array:
        """Particles currently parked in the spill buffer."""
        return jnp.sum(self.sidx >= 0).astype(jnp.int32)


def _bin_now(x, y, vx, vy, grid: GridSpec2D, alive=None):
    b = bin_particles(x, y, grid, alive=alive, with_csr=False)
    xd = to_dense(b, x, fill=FAR)
    yd = to_dense(b, y, fill=FAR)
    vxd = to_dense(b, vx, fill=0.0)
    vyd = to_dense(b, vy, fill=0.0)
    return b, xd, yd, vxd, vyd


def init_dense(state: FluidState, grid: GridSpec2D,
               spill_cap: int = SPILL_CAP,
               collect_spill: bool = True) -> DenseSim:
    """Bin a particle state into the dense representation (sort-based — runs
    once per session; steady-state rebins use the local reslot kernel).

    Particles the init sort drops to cell capacity (rank >= cap) are
    collected into the spill buffer so later rebins can re-admit them once
    their cell has room (see module docstring, recovery semantics).  Pass
    ``collect_spill=False`` when stepping with recovery OFF (``make_step``'s
    default ``n=None``): with nothing draining the buffer, a collected drop
    would surface in every extraction as a frozen phantom forever, instead
    of the documented counted-loss/FAR contract."""
    b, xd, yd, vxd, vyd = _bin_now(state.x, state.y, state.vx, state.vy, grid)
    idx = jnp.arange(state.n, dtype=jnp.int32)
    idx_d = to_dense(b, idx, fill=-1)
    n = state.n
    over = b.rank >= grid.cap if collect_spill \
        else jnp.zeros_like(b.rank, dtype=bool)
    dpos = jnp.nonzero(over, size=spill_cap, fill_value=n)[0]
    dv = dpos < n
    ds = jnp.minimum(dpos, n - 1)
    return DenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd,
                    rho_d=jnp.zeros_like(xd), ref_xd=xd, ref_yd=yd,
                    idx_d=idx_d, occ=reslot_ops.block_kmax3(xd, grid),
                    disp2=jnp.float32(0.0),
                    age=jnp.int32(0), overflow=b.overflow,
                    lost=jnp.int32(0), rebin_count=jnp.int32(1),
                    step=state.step,
                    sx=jnp.where(dv, state.x[ds], FAR),
                    sy=jnp.where(dv, state.y[ds], FAR),
                    svx=jnp.where(dv, state.vx[ds], 0.0),
                    svy=jnp.where(dv, state.vy[ds], 0.0),
                    sidx=jnp.where(dv, dpos.astype(jnp.int32), -1),
                    readmitted=jnp.int32(0))


def init_dense_chunked(state: FluidState, grid: GridSpec2D, n_chunks: int,
                       spill_cap: int = SPILL_CAP,
                       collect_spill: bool = True) -> DenseSim:
    """``init_dense`` with O(N / n_chunks) transient memory.

    The sort-based init's workspace (argsort keys/values + several [N]
    int planes) is what exhausts HBM first at very large N — the resident
    dense planes themselves fit well past it (BASELINE.json
    round3_memory_ceiling).  This variant scans over particle chunks,
    keeping a running per-cell occupancy count: a particle's global
    within-cell rank is its stable rank within the chunk plus the cells'
    count from earlier chunks, which reproduces the sort-based slot
    assignment EXACTLY (chunks are processed in original particle order,
    and the sort was stable in that same order) — the resulting DenseSim
    is bitwise-identical to ``init_dense``'s (tests/test_verlet.py).

    Transients per chunk: one [N/K] argsort + a handful of [N/K] planes,
    vs the full-[N] sort pipeline.  Use for N >~ 64M (Session's
    ``init_chunks``); below that the one-shot sort is simpler and the
    memory headroom irrelevant."""
    g = grid
    n = state.n
    K = n_chunks
    c = -(-n // K)
    pad = K * c - n

    def padf(a, fill):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    chunks = (padf(state.x, FAR).reshape(K, c),
              padf(state.y, FAR).reshape(K, c),
              padf(state.vx, 0.0).reshape(K, c),
              padf(state.vy, 0.0).reshape(K, c),
              padf(jnp.arange(n, dtype=jnp.int32), -1).reshape(K, c))

    body = _chunk_init_body(g, spill_cap, collect_spill)
    out, _ = jax.lax.scan(body, _chunk_init_carry(g, spill_cap), chunks)
    return _chunk_init_finish(out, grid, state.step)


def init_dense_gen(gen, n: int, grid: GridSpec2D, n_chunks: int,
                   spill_cap: int = SPILL_CAP,
                   collect_spill: bool = True,
                   step=None) -> DenseSim:
    """``init_dense_chunked`` with chunks COMPUTED instead of sliced.

    ``gen(gi)`` takes a [c] int32 array of GLOBAL particle indices and
    returns that chunk's ``(x, y, vx, vy)`` as [c] f32 arrays — a traced
    jnp formula of the index (e.g. ``lattice_gen``'s row-major lattice).
    The four [N] particle planes never exist on device: the chunked init
    already shrank the sort workspace to O(N/K), but its INPUT was still
    the full [N] FluidState, which at the HBM ceiling coexists with the
    ~resident-size dense carry (the 160M first-dispatch OOM — donation
    can't help, no init output matches the [N] shape).  Bitwise-identical
    to ``init_dense`` on the state ``gen`` describes (same stable-rank
    machinery; gated by tests/test_verlet.py)."""
    g = grid
    K = n_chunks
    c = -(-n // K)
    body = _chunk_init_body(g, spill_cap, collect_spill)

    def gen_body(carry, k):
        gi = k * c + jnp.arange(c, dtype=jnp.int32)
        valid = gi < n
        x, y, vx, vy = gen(gi)
        chunk = (jnp.where(valid, x, FAR), jnp.where(valid, y, FAR),
                 jnp.where(valid, vx, 0.0), jnp.where(valid, vy, 0.0),
                 jnp.where(valid, gi, -1))
        return body(carry, chunk)

    out, _ = jax.lax.scan(gen_body, _chunk_init_carry(g, spill_cap),
                          jnp.arange(K, dtype=jnp.int32))
    return _chunk_init_finish(
        out, grid, jnp.int32(0) if step is None else step)


def _chunk_init_carry(g: GridSpec2D, spill_cap: int):
    shape = (g.ny_pad, g.cap, g.nx_pad)
    return (jnp.full(shape, FAR, jnp.float32),
            jnp.full(shape, FAR, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
            jnp.zeros((g.ny, g.nx), jnp.int32),         # running cell counts
            jnp.int32(0),                               # overflow
            jnp.full((spill_cap,), FAR, jnp.float32),
            jnp.full((spill_cap,), FAR, jnp.float32),
            jnp.zeros((spill_cap,), jnp.float32),
            jnp.zeros((spill_cap,), jnp.float32),
            jnp.full((spill_cap,), -1, jnp.int32))


def _chunk_init_body(g: GridSpec2D, spill_cap: int, collect_spill: bool,
                     origin=None):
    """``origin`` optionally overrides the grid's static world origin with
    traced values (the sharded chunked init passes the per-device slab
    origin — see parallel/shard_verlet.local_init_chunked)."""
    def body(carry, chunk):
        (xd, yd, vxd, vyd, idx_d, cnt, overflow,
         sx, sy, svx, svy, sidx) = carry
        x, y, vx, vy, idx = chunk
        valid = idx >= 0                       # padding slots are dead
        cx, cy = cell_coords(x, y, g, origin)
        cid = jnp.where(valid, cx + cy * g.nx, g.num_cells)

        # stable within-chunk rank (same machinery as bin_particles)
        m = x.shape[0]
        perm = jnp.argsort(cid, stable=True)
        pos = jnp.arange(m, dtype=jnp.int32)
        sc = cid[perm]
        is_new = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
        seg = jax.lax.cummax(jnp.where(is_new, pos, -1))
        rank = jnp.zeros((m,), jnp.int32).at[perm].set(pos - seg)

        base = cnt[cy, cx]                     # counts from earlier chunks
        slot = base + rank                     # == the global stable rank
        over = valid & (slot >= g.cap)
        store = jnp.where(valid & ~over, slot, g.cap + (1 << 20))
        row = jnp.where(valid, cy + g.row0, 0)
        col = jnp.where(valid, cx + 1, 0)
        xd = xd.at[row, store, col].set(x, mode="drop")
        yd = yd.at[row, store, col].set(y, mode="drop")
        vxd = vxd.at[row, store, col].set(vx, mode="drop")
        vyd = vyd.at[row, store, col].set(vy, mode="drop")
        idx_d = idx_d.at[row, store, col].set(idx, mode="drop")
        cnt = cnt.at[cy, cx].add(valid.astype(jnp.int32), mode="drop")
        overflow = overflow + jnp.sum(over).astype(jnp.int32)

        if collect_spill:
            dpos = jnp.nonzero(over, size=spill_cap, fill_value=m)[0]
            dv = dpos < m
            ds = jnp.minimum(dpos, m - 1)
            batch = (jnp.where(dv, x[ds], FAR), jnp.where(dv, y[ds], FAR),
                     jnp.where(dv, vx[ds], 0.0), jnp.where(dv, vy[ds], 0.0),
                     jnp.where(dv, idx[ds], -1))
            pool = [jnp.concatenate([old, new]) for old, new in
                    zip((sx, sy, svx, svy, sidx), batch)]
            keep = jnp.argsort(pool[4] < 0, stable=True)[:spill_cap]
            sx, sy, svx, svy, sidx = (p[keep] for p in pool)
        return (xd, yd, vxd, vyd, idx_d, cnt, overflow,
                sx, sy, svx, svy, sidx), None
    return body


def _chunk_init_finish(out, grid: GridSpec2D, step) -> DenseSim:
    (xd, yd, vxd, vyd, idx_d, _cnt, overflow,
     sx, sy, svx, svy, sidx) = out
    return DenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd,
                    rho_d=jnp.zeros_like(xd), ref_xd=xd, ref_yd=yd,
                    idx_d=idx_d, occ=reslot_ops.block_kmax3(xd, grid),
                    disp2=jnp.float32(0.0), age=jnp.int32(0),
                    overflow=overflow, lost=jnp.int32(0),
                    rebin_count=jnp.int32(1), step=step,
                    sx=sx, sy=sy, svx=svx, svy=svy, sidx=sidx,
                    readmitted=jnp.int32(0))


def extract_fields(sim: DenseSim, grid: GridSpec2D, params: FluidParams,
                   n: int):
    """Per-particle (x, y, vx, vy, rho) in ORIGINAL order via one stacked
    dense->[N] scatter (the only random-access op left in the solver; runs
    on demand, not per step).  Suspended particles (in the spill buffer
    awaiting re-admission) surface at their FROZEN positions/velocities
    with analytic self-density; only drops that exceeded the spill
    capacity come back as FAR (counted in sim.overflow, never
    readmitted)."""
    def real(a):
        return jax.lax.slice(
            a, (grid.row0, 0, 1),
            (grid.row0 + grid.ny, grid.cap, 1 + grid.nx)).reshape(-1)

    idx = real(sim.idx_d)
    vals = jnp.stack([real(sim.xd), real(sim.yd), real(sim.vxd),
                      real(sim.vyd), real(sim.rho_d)], axis=-1)
    safe = jnp.where(idx >= 0, idx, n + (1 << 20))
    self_rho = self_density(params)
    init = jnp.broadcast_to(
        jnp.stack([jnp.float32(FAR), jnp.float32(FAR), jnp.float32(0.0),
                   jnp.float32(0.0), self_rho]), (n, 5))
    out = init.at[safe].set(vals, mode="drop")
    # spill overlay: suspended particles at their frozen state (their idx
    # never appears in the dense planes, so there is no conflict)
    ssafe = jnp.where(sim.sidx >= 0, sim.sidx, n + (1 << 20))
    svals = jnp.stack([sim.sx, sim.sy, sim.svx, sim.svy,
                       jnp.full_like(sim.sx, self_rho)], axis=-1)
    out = out.at[ssafe].set(svals, mode="drop")
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4]


def _skin(params: FluidParams, grid: GridSpec2D):
    return (grid.cell_size - params.h) * 0.5


def _ref_placeholder() -> jax.Array:
    """Stand-in for the rebin-reference planes in the refless-trigger
    posture: shape-stable (1, 1, 1) keeps the scan carry consistent while
    the two plane-footprints vanish from HBM (see make_step_parts)."""
    return jnp.zeros((1, 1, 1), jnp.float32)


def _first_k_flat(mask: jax.Array, k: int) -> jax.Array:
    """First ``k`` set positions of a flat bool array, ascending, padded
    with ``mask.size`` — exactly ``jnp.nonzero(mask, size=k,
    fill_value=mask.size)[0]`` but without its two [total]-sized int32
    temps (the bool cast + cumsum), which at 160M particles are 2.76 GiB
    of the recovery rebin's HLO temps — most of the difference between
    the rebin dispatch fitting HBM and RESOURCE_EXHAUSTED (probe_hbm:
    recovery machinery = 3.97 of the 5.70 GiB rebin TEMP).

    Hierarchical: block-any over B-element blocks, take the first <=k
    blocks containing any set bit (ascending block order — the first k
    set bits live in the first <=k such blocks), gather them, and run
    one small nonzero over the gathered k*B elements.  Temps are
    O(total/B) bool + O(k*B) int32 (a few MB at k=256).  Non-multiple-of-B
    sizes are padded with False up to B (padding positions can never be
    selected, and the fill sentinel stays the ORIGINAL ``total``) — B must
    not shrink with ragged sizes or the [total]-sized temps this function
    exists to avoid come back."""
    total = mask.shape[0]
    B = 1024
    if total == 0:
        return jnp.full((k,), 0, dtype=jnp.int32)
    pad = -total % B
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad,), dtype=mask.dtype)])
    nb = (total + pad) // B
    blk = mask.reshape(nb, B)
    bpos = jnp.nonzero(blk.any(axis=1), size=k, fill_value=nb)[0]
    bv = bpos < nb
    bsf = jnp.minimum(bpos, nb - 1)
    g = blk[bsf] & bv[:, None]
    lpos = jnp.nonzero(g.reshape(-1), size=k, fill_value=k * B)[0]
    lv = lpos < k * B
    lsf = jnp.minimum(lpos, k * B - 1)
    return jnp.where(lv, bsf[lsf // B] * B + lsf % B, total)


def _spill_recover(ops, *, grid: GridSpec2D, n: int, vmax2: float):
    """Overflow recovery at a rebin (runs inside lax.cond, only when a drop
    happened this rebin or the spill buffer is non-empty):

    1. COLLECT particles the reslot just dropped (present in the pre-rebin
       idx planes, absent post) into the spill buffer — their state freezes
       at the drop point;
    2. RE-ADMIT spill entries whose target cell (from the frozen position)
       has free capacity after the reslot, at ranks continuing from the
       cell's occupancy — deterministic, capacity-bounded, oldest-first.

    A particle dropped THIS rebin can never re-admit in the same pass (its
    cell is at/over cap by construction), so collect-then-admit in one pass
    is exact.  Entries beyond the spill capacity are permanently lost
    (cumulative ``overflow`` still counts them).

    Re-admission is gated on the SKIN INVARIANT: only entries with
    |v|^2 <= ``vmax2`` (= (skin_half/dt)^2) come back — a faster particle
    would outrun the ±1 reslot window again immediately, and re-admitting
    ballistic runaways lets energy-injecting walls (the reference's default
    bounce=-3) amplify them without bound where suspension keeps the run
    finite.  Ballistic entries stay suspended (visible at position,
    counted) until... they never slow while frozen — i.e. permanently,
    exactly the pre-recovery degradation semantics for that class."""
    (xd, yd, vxd, vyd, idx_d, cnt,
     pxd, pyd, pvxd, pvyd, pidx_d,
     sx, sy, svx, svy, sidx, readmitted) = ops
    cap = grid.cap
    K = sx.shape[0]

    # -- 1. collect: a particle the reslot dropped is one whose id no
    # longer appears ANYWHERE in the post planes.  reslot can only place
    # a particle in the cell its position maps to, and it only collects
    # from the ±1 slot window — so "nowhere in post" is EXACTLY "not
    # within the 3x3 cell window of its pre-rebin slot".  The window test
    # is 9*cap vectorized dense compares; the previous [n]-presence-mask
    # form (scatter 262M ids, gather them back) cost whole SECONDS per
    # recovery rebin at 100M+ and ~2.5 GB of transients.  MEMORY SHAPE
    # MATTERS at the HBM ceiling: per-slot sublane slices
    # (``shifted[:, k:k+1, :]``) each materialize a layout-changing copy
    # on TPU (the cap axis is the (8,128) tile's sublane dim), and XLA
    # kept all 72 live as operands of one fusion — ~9 GB of temps at
    # 112M, a compile-time RESOURCE_EXHAUSTED.  Hence: a fori_loop over
    # the 9 shifts (bounds per-iteration liveness to ONE shifted window)
    # with the cap-membership test as a broadcast-compare ``any``
    # reduce (fuses; no sublane slicing at all).
    R, _, C = pidx_d.shape
    padded = jnp.pad(idx_d, ((1, 1), (0, 0), (1, 1)), constant_values=-1)

    def _shift_any(s, found):
        win = jax.lax.dynamic_slice(padded, (s // 3, 0, s % 3),
                                    (R, cap, C))
        return found | jnp.any(
            pidx_d[:, :, None, :] == win[:, None, :, :], axis=2)

    found = jax.lax.fori_loop(0, 9, _shift_any,
                              jnp.zeros(pidx_d.shape, bool))
    pre = pidx_d.reshape(-1)
    total = pre.shape[0]
    dropped = (pre >= 0) & ~found.reshape(-1)
    dpos = _first_k_flat(dropped, K)
    dv = dpos < total
    dsf = jnp.minimum(dpos, total - 1)
    ndx = jnp.where(dv, pxd.reshape(-1)[dsf], FAR)
    ndy = jnp.where(dv, pyd.reshape(-1)[dsf], FAR)
    ndvx = jnp.where(dv, pvxd.reshape(-1)[dsf], 0.0)
    ndvy = jnp.where(dv, pvyd.reshape(-1)[dsf], 0.0)
    ndi = jnp.where(dv, pre[dsf], -1)

    sx, sy, svx, svy, sidx = _spill_merge(
        (sx, sy, svx, svy, sidx), (ndx, ndy, ndvx, ndvy, ndi))

    return _spill_admit(xd, yd, vxd, vyd, idx_d, cnt,
                        sx, sy, svx, svy, sidx, readmitted,
                        grid=grid, vmax2=vmax2)


def _spill_merge(spill, drops):
    """Merge new drop candidates into the spill buffer (old entries kept
    first: oldest-first admission priority), compacting valid entries into
    the K slots.  Entries beyond K are permanently lost (still counted in
    the cumulative overflow)."""
    pool = [jnp.concatenate([a, b]) for a, b in zip(spill, drops)]
    keep = jnp.argsort(pool[4] < 0, stable=True)[:spill[0].shape[0]]
    return tuple(p[keep] for p in pool)


def _spill_admit(xd, yd, vxd, vyd, idx_d, cnt,
                 sx, sy, svx, svy, sidx, readmitted, *,
                 grid: GridSpec2D, vmax2: float):
    """Re-admit spill entries into cells with free post-rebin capacity
    (step 2 of _spill_recover; shared with the planar rebin path)."""
    cap = grid.cap
    K = sx.shape[0]
    valid = sidx >= 0
    inv = 1.0 / grid.cell_size
    gx = jnp.where(valid, sx, grid.origin_x)   # FAR would overflow int32
    gy = jnp.where(valid, sy, grid.origin_y)
    ccx = jnp.clip(jnp.floor((gx - grid.origin_x) * inv).astype(jnp.int32),
                   0, grid.nx - 1)
    ccy = jnp.clip(jnp.floor((gy - grid.origin_y) * inv).astype(jnp.int32),
                   0, grid.ny - 1)
    row = ccy + grid.row0
    col = ccx + 1
    base = jnp.minimum(cnt[row, col], cap)
    cid = row * grid.nx_pad + col
    io = jnp.arange(K)
    elig = valid & (svx * svx + svy * svy <= vmax2)
    rank = jnp.sum((cid[:, None] == cid[None, :]) & elig[None, :]
                   & (io[None, :] < io[:, None]), axis=1)
    admit = elig & (base + rank < cap)
    slot = jnp.where(admit, base + rank, cap + (1 << 20))  # OOB -> dropped
    xd = xd.at[row, slot, col].set(sx, mode="drop")
    yd = yd.at[row, slot, col].set(sy, mode="drop")
    vxd = vxd.at[row, slot, col].set(svx, mode="drop")
    vyd = vyd.at[row, slot, col].set(svy, mode="drop")
    idx_d = idx_d.at[row, slot, col].set(sidx, mode="drop")
    readmitted = readmitted + jnp.sum(admit).astype(jnp.int32)
    sx = jnp.where(admit, FAR, sx)
    sy = jnp.where(admit, FAR, sy)
    svx = jnp.where(admit, 0.0, svx)
    svy = jnp.where(admit, 0.0, svy)
    sidx = jnp.where(admit, -1, sidx)
    return xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy, sidx, readmitted


def make_step_parts(params: FluidParams, cfg: IntegrateConfig,
                    grid: GridSpec2D, stencils=None, max_age: int = 64,
                    reslot=None, n: int | None = None, planar: bool = False,
                    refless: bool = False, donors: bool = False):
    """Build the dense step DECOMPOSED as ``(pure_step, rebin_fn,
    need_fn)`` — the pieces ``make_step`` composes into the standard
    per-step ``cond(need, rebin) -> kernels`` shape.

    The decomposition exists for the segmented HBM-ceiling driver
    (``Session.run`` near the top of HBM): a rebin ``lax.cond`` inside
    the step scan statically reserves one temp plane per cond output
    (XLA cannot alias the untaken branch with the scan carry, and its
    scheduler overlaps the per-plane conds, so all of them are live at
    once — measured 4 x 1.38 GiB HLO temps at 160M particles, the
    compile-time OOM).  Driving ``while_loop(pure_step)`` until
    ``need_fn`` fires and dispatching ``rebin_fn`` separately (donated,
    at the jit TOP level where aliasing works) removes those temps from
    the hot program entirely.

    ``refless=True`` is the REFLESS-TRIGGER posture (the last 2
    plane-footprints at the HBM ceiling): the rebin-reference planes are
    dropped from the resident set (the sim carries (1,1,1) placeholders)
    and ``disp2`` holds the ACCUMULATED sum of per-step maximum
    displacements instead of the max displacement-from-reference — a
    conservative bound (triangle inequality), so rebins fire somewhat
    earlier but the physics is identical.  NOT bitwise-comparable to the
    ref-based trigger (different rebin schedule -> different f32
    summation order); fingerprint-guarded in checkpoints.

    ``donors=True`` (requires ``planar`` and ``refless``) additionally
    chains each planar apply into the PREVIOUS plane's dead buffer via
    kernel-level ``input_output_aliases``, seeded by the dead rho plane
    (rebin drops rho; the caller re-attaches a fresh plane — see
    Session._run_segmented).  Only valid for a TOP-LEVEL donated rebin
    dispatch whose argument order matches the chain (the rotated
    ``rebin_one`` in Session._segmented_build): values are bitwise the
    donor-less planar rebin's, but the output DenseSim carries a (1,1,1)
    rho placeholder."""
    return _build_step(params, cfg, grid, stencils, max_age, reslot, n,
                       planar, refless, donors)


def make_step(params: FluidParams, cfg: IntegrateConfig, grid: GridSpec2D,
              stencils=None, max_age: int = 64, reslot=None,
              n: int | None = None, planar: bool = False,
              refless: bool = False):
    """Build the dense step fn: DenseSim -> DenseSim.

    Requires grid.cell_size > h (a real skin).  ``max_age`` bounds staleness
    regardless of displacement.  ``reslot`` defaults to the Pallas local
    rebin on TPU and the XLA rolled-view version elsewhere.  ``n`` (the
    particle count) enables overflow RECOVERY at rebins (spill collection +
    re-admission, see ``_spill_recover``); with ``n=None`` drops are
    counted but the spill buffer is never refilled or drained.

    With ``stencils=None`` (the flagship default) the step runs the FUSED
    Pallas forces+integrate kernel: accelerations stay in-register, the
    separate integrate pass and displacement reduction disappear, and the
    skin trigger reads the ``disp2`` scalar the previous step's kernel
    epilogue wrote (identical value — same positions, same reference).
    Explicit ``stencils`` (XLA fallback / custom) keep the unfused path
    with the same stored-disp2 trigger semantics.

    ``planar=True`` switches the rebin to the plane-at-a-time pipeline
    (ops/reslot.py select + per-plane apply): bit-identical slot
    assignments, but the rebin peak never holds all 5 input + 5 output
    planes at once — the HBM-ceiling mode (the fused rebin's ~13
    plane-footprints is the observed 128M-particle fault).  The recovery
    collect reads the routing code instead of comparing pre/post idx
    planes, so the pre-rebin payload planes die at their own apply."""
    pure_step, rebin_fn, need_fn = _build_step(
        params, cfg, grid, stencils, max_age, reslot, n, planar, refless)

    def step(sim: DenseSim) -> DenseSim:
        # rebin if any particle outran half the skin (or bins are too old);
        # disp2 was computed at the end of the previous step against the
        # same reference — the same value the old pre-step reduction read
        sim = jax.lax.cond(need_fn(sim), rebin_fn, lambda s: s, sim)
        return pure_step(sim)

    return step


def _build_step(params: FluidParams, cfg: IntegrateConfig, grid: GridSpec2D,
                stencils, max_age: int, reslot, n: int | None,
                planar: bool, refless: bool = False, donors: bool = False):
    if donors and not (planar and refless):
        raise ValueError("donors=True requires planar=True and "
                         "refless=True (the donor chain is seeded by the "
                         "dead rho plane and the ref placeholders)")
    fused = stencils is None
    # small grids take the MONO kernel (one launch/step, halo-rho
    # recomputed in-VMEM — ulp-level identical to the two-kernel path);
    # large grids keep density + fused-forces with double-buffered DMA.
    # refless is a ceiling posture — never paired with mono's tiny grids
    mono = (fused and grid.n_row_blocks < pallas_solver._MONO_MAX_BLOCKS
            and not refless)
    if fused:
        density_fn, _ = pallas_solver.make_stencils(grid)
    else:
        density_fn, forces_fn = stencils
    # the carried rho_d is recomputed from scratch every step, so the old
    # plane is dead at step start — stencils that expose ``rho_out=``
    # (pallas density does) write the new rho over its buffer, shedding one
    # plane-footprint from the step's HBM peak (decides fit at 160M)
    # prefer the explicit capability flag (make_stencils sets it; survives
    # functools.partial / jit wrappers, which hide the signature — ADVICE
    # r4); fall back to signature sniffing for hand-rolled stencils
    _density_aliases = getattr(density_fn, "supports_rho_out", None)
    if _density_aliases is None:
        import inspect
        try:
            _density_aliases = "rho_out" in inspect.signature(
                density_fn).parameters
        except (TypeError, ValueError):
            _density_aliases = False
    if reslot is None:
        reslot = reslot_ops.make_reslot(
            grid, use_pallas=not reslot_ops._interpret_default())
    # NB: requires grid.cell_size > h (a real skin, e.g. default_grid's 1.5h);
    # with zero skin every step would rebin and this is just a slower eager
    # solver. Not assertable here: params.h may be traced.
    skin_half = _skin(params, grid)

    def rebin_planar(sim: DenseSim) -> DenseSim:
        """Plane-at-a-time rebin (see make_step docstring).  Contractually
        identical to ``rebin`` below — same slot assignments, diagnostics,
        and recovery semantics — restructured for HBM-peak liveness:
        collect happens BEFORE the applies (old planes still alive), each
        apply kills its input plane, admit runs on the new planes."""
        interp = reslot_ops._interpret_default()
        alive_before = jnp.sum(sim.xd < FAR * 0.5).astype(jnp.int32)
        code, cnt = reslot_ops.select_pallas(sim.xd, sim.yd, grid,
                                             interpret=interp, occ=sim.occ)
        matched = jnp.sum(cnt).astype(jnp.int32)
        captured = jnp.sum(jnp.minimum(cnt, grid.cap)).astype(jnp.int32)
        new_over = matched - captured
        sx, sy, svx, svy = sim.sx, sim.sy, sim.svx, sim.svy
        sidx, readmitted = sim.sidx, sim.readmitted
        need = jnp.bool_(False)
        if n is not None:
            need = (alive_before - captured > 0) | jnp.any(sidx >= 0)
            K = sx.shape[0]
            total = sim.idx_d.size

            # Drop POSITIONS resolve inside the cond from the code + idx
            # planes ALONE; the K-sized VALUE gathers run outside it.
            # Keeping the payload planes (xd/yd/...) out of the cond's
            # operands matters at the HBM ceiling: donated planes captured
            # by a control-flow region get copy-protected — at 192M that
            # was two full-plane copies (3.3 GiB of rebin_one's HLO temps)
            # and the difference between fitting and RESOURCE_EXHAUSTED.
            def find_drops(ops):
                code_, pidx_d = ops
                taken = reslot_ops.taken_mask(code_, grid.cap)
                dropped = (pidx_d.reshape(-1) >= 0) & ~taken.reshape(-1)
                return _first_k_flat(dropped, K)

            dpos = jax.lax.cond(
                need, find_drops,
                lambda op: jnp.full((K,), total, jnp.int32),
                (code, sim.idx_d))
            dv = dpos < total
            dsf = jnp.minimum(dpos, total - 1)
            # 3D gathers: decompose the flat C-order positions instead of
            # reshaping the planes — a [total] reshape of a (8,128)-tiled
            # plane is a full-plane relayout copy, and five of them were
            # most of the rotated rebin's 7.3 GiB TEMP at 192M
            _, CAP, C = sim.xd.shape
            dr = dsf // (CAP * C)
            drem = dsf - dr * (CAP * C)
            dslot = drem // C
            dcol = drem - dslot * C
            drops = (jnp.where(dv, sim.xd[dr, dslot, dcol], FAR),
                     jnp.where(dv, sim.yd[dr, dslot, dcol], FAR),
                     jnp.where(dv, sim.vxd[dr, dslot, dcol], 0.0),
                     jnp.where(dv, sim.vyd[dr, dslot, dcol], 0.0),
                     jnp.where(dv, sim.idx_d[dr, dslot, dcol], -1))
            sx, sy, svx, svy, sidx = jax.lax.cond(
                need,
                lambda op: _spill_merge(op[0], op[1]),
                lambda op: op[0],
                ((sx, sy, svx, svy, sidx), drops))

        if donors:
            # donor chain (see make_step_parts / apply_code_pallas): each
            # apply writes into the previous plane's dead buffer, seeded
            # by the dead rho plane; idx lands in vyd's buffer (bitcast)
            xd = reslot_ops.apply_code_pallas(sim.xd, code, sim.occ, grid,
                                              FAR, interp, out=sim.rho_d)
            yd = reslot_ops.apply_code_pallas(sim.yd, code, sim.occ, grid,
                                              FAR, interp, out=sim.xd)
            vxd = reslot_ops.apply_code_pallas(sim.vxd, code, sim.occ,
                                               grid, 0.0, interp,
                                               out=sim.yd)
            vyd = reslot_ops.apply_code_pallas(sim.vyd, code, sim.occ,
                                               grid, 0.0, interp,
                                               out=sim.vxd)
            idx_d = reslot_ops.apply_code_pallas(
                sim.idx_d, code, sim.occ, grid, -1, interp,
                out=jax.lax.bitcast_convert_type(sim.vyd, jnp.int32))
        else:
            xd = reslot_ops.apply_code_pallas(sim.xd, code, sim.occ, grid,
                                              FAR, interp)
            yd = reslot_ops.apply_code_pallas(sim.yd, code, sim.occ, grid,
                                              FAR, interp)
            vxd = reslot_ops.apply_code_pallas(sim.vxd, code, sim.occ,
                                               grid, 0.0, interp)
            vyd = reslot_ops.apply_code_pallas(sim.vyd, code, sim.occ,
                                               grid, 0.0, interp)
            idx_d = reslot_ops.apply_code_pallas(sim.idx_d, code, sim.occ,
                                                 grid, -1, interp)

        if n is not None:
            vmax2 = (skin_half / cfg.dt) ** 2
            (xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy, sidx,
             readmitted) = jax.lax.cond(
                need,
                lambda op: _spill_admit(*op, grid=grid, vmax2=vmax2),
                lambda op: (op[0], op[1], op[2], op[3], op[4],
                            op[6], op[7], op[8], op[9], op[10], op[11]),
                (xd, yd, vxd, vyd, idx_d, cnt,
                 sx, sy, svx, svy, sidx, readmitted))
        # donors: rho's buffer now holds the new xd — the output carries a
        # (1,1,1) placeholder and the segmented driver re-attaches a fresh
        # zero plane (rho is recomputed from scratch by the next step's
        # density via its rho_out alias, so the value was dead either way)
        return DenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd,
                        rho_d=_ref_placeholder() if donors else sim.rho_d,
                        ref_xd=_ref_placeholder() if refless else xd,
                        ref_yd=_ref_placeholder() if refless else yd,
                        idx_d=idx_d,
                        occ=reslot_ops.block_kmax3(xd, grid),
                        disp2=jnp.float32(0.0),
                        age=jnp.int32(0),
                        overflow=sim.overflow + new_over,
                        lost=sim.lost + (alive_before - matched),
                        rebin_count=sim.rebin_count + 1, step=sim.step,
                        sx=sx, sy=sy, svx=svx, svy=svy, sidx=sidx,
                        readmitted=readmitted)

    def rebin(sim: DenseSim) -> DenseSim:
        alive_before = jnp.sum(sim.xd < FAR * 0.5).astype(jnp.int32)
        xd, yd, vxd, vyd, idx_d, cnt = reslot(
            sim.xd, sim.yd, sim.vxd, sim.vyd, sim.idx_d)
        matched = jnp.sum(cnt).astype(jnp.int32)
        captured = jnp.sum(jnp.minimum(cnt, grid.cap)).astype(jnp.int32)
        new_over = matched - captured
        sx, sy, svx, svy = sim.sx, sim.sy, sim.svx, sim.svy
        sidx, readmitted = sim.sidx, sim.readmitted
        if n is not None:
            # overflow recovery: collect EVERY particle that disappeared
            # this rebin (capacity drops AND ±1-window losses — the latter
            # only occur when extreme velocities break the skin invariant,
            # and recovering them turns "counted loss" into "suspended,
            # re-admitted when they slow down") + re-admit waiting spill
            # entries.  Cond-gated so overflow-0 scenes pay only the (tiny)
            # predicate.
            need = (alive_before - captured > 0) | jnp.any(sidx >= 0)
            ops = (xd, yd, vxd, vyd, idx_d, cnt,
                   sim.xd, sim.yd, sim.vxd, sim.vyd, sim.idx_d,
                   sx, sy, svx, svy, sidx, readmitted)
            vmax2 = (skin_half / cfg.dt) ** 2
            (xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy, sidx,
             readmitted) = jax.lax.cond(
                need, partial(_spill_recover, grid=grid, n=n, vmax2=vmax2),
                lambda op: (op[0], op[1], op[2], op[3], op[4],
                            op[11], op[12], op[13], op[14], op[15], op[16]),
                ops)
        return DenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=sim.rho_d,
                        ref_xd=_ref_placeholder() if refless else xd,
                        ref_yd=_ref_placeholder() if refless else yd,
                        idx_d=idx_d,
                        occ=reslot_ops.block_kmax3(xd, grid),
                        disp2=jnp.float32(0.0),
                        age=jnp.int32(0),
                        overflow=sim.overflow + new_over,
                        lost=sim.lost + (alive_before - matched),
                        rebin_count=sim.rebin_count + 1, step=sim.step,
                        sx=sx, sy=sy, svx=svx, svy=svy, sidx=sidx,
                        readmitted=readmitted)

    def need_fn(sim: DenseSim):
        """The rebin trigger a step checks BEFORE its kernels: any particle
        outran half the skin (disp2 stored by the previous step's epilogue
        against the same reference) or the bins aged out.  Refless: disp2
        is the accumulated LINEAR displacement bound (sum of per-step
        maxima), compared unsquared."""
        if refless:
            return (sim.disp2 > skin_half) | (sim.age >= max_age)
        return (sim.disp2 > skin_half * skin_half) | (sim.age >= max_age)

    def pure_step(sim: DenseSim) -> DenseSim:
        if mono:
            xd, yd, vxd, vyd, rho_d, disp2 = pallas_solver.mono_step_pallas(
                sim.xd, sim.yd, sim.vxd, sim.vyd,
                sim.ref_xd, sim.ref_yd, params, cfg, grid, occ=sim.occ)
            return dataclasses.replace(
                sim, xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                disp2=disp2, age=sim.age + 1, step=sim.step + 1)

        if _density_aliases:
            rho_d = density_fn(sim.xd, sim.yd, params, occ=sim.occ,
                               rho_out=sim.rho_d)
        else:
            rho_d = density_fn(sim.xd, sim.yd, params, occ=sim.occ)

        if fused:
            # refless: pass the position planes as the (unread) ref args —
            # same buffers, zero extra HBM; the kernel reports this step's
            # max displacement and the accumulated bound carries in disp2
            refx = sim.xd if refless else sim.ref_xd
            refy = sim.yd if refless else sim.ref_yd
            xd, yd, vxd, vyd, disp2 = pallas_solver.forces_integrate_pallas(
                sim.xd, sim.yd, sim.vxd, sim.vyd, rho_d,
                refx, refy, params, cfg, grid, occ=sim.occ,
                refless=refless)
            if refless:
                disp2 = sim.disp2 + jnp.sqrt(disp2)
            return dataclasses.replace(
                sim, xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                disp2=disp2, age=sim.age + 1, step=sim.step + 1)

        live = sim.xd < FAR * 0.5
        ax_d, ay_d = forces_fn(sim.xd, sim.yd, sim.vxd, sim.vyd, rho_d,
                               params, occ=sim.occ)
        ay_d = ay_d + GRAVITY_Y  # harmless on dead slots; they stay masked

        # dense semi-implicit Euler + bounce box, masked so FAR stays FAR
        vx = sim.vxd + ax_d * cfg.dt
        vy = sim.vyd + ay_d * cfg.dt
        x = sim.xd + vx * cfg.dt
        y = sim.yd + vy * cfg.dt

        below = y < cfg.floor_y
        y = jnp.where(below, cfg.floor_y, y)
        vy = jnp.where(below, vy * cfg.bounce, vy)
        right = x > cfg.x_max
        x = jnp.where(right, cfg.x_max, x)
        vx = jnp.where(right, vx * cfg.bounce, vx)
        left = x < cfg.x_min
        x = jnp.where(left, cfg.x_min, x)
        vx = jnp.where(left, vx * cfg.bounce, vx)

        xd = jnp.where(live, x, sim.xd)
        yd = jnp.where(live, y, sim.yd)
        if refless:
            ddx = xd - sim.xd            # this step's move (dead: FAR-FAR=0)
            ddy = yd - sim.yd
            disp_new = sim.disp2 + jnp.sqrt(jnp.max(ddx * ddx + ddy * ddy))
        else:
            ddx = xd - sim.ref_xd
            ddy = yd - sim.ref_yd
            disp_new = jnp.max(ddx * ddx + ddy * ddy)
        return dataclasses.replace(
            sim,
            xd=xd,
            yd=yd,
            vxd=jnp.where(live, vx, 0.0),
            vyd=jnp.where(live, vy, 0.0),
            rho_d=rho_d,
            disp2=disp_new,
            age=sim.age + 1,
            step=sim.step + 1,
        )

    return pure_step, (rebin_planar if planar else rebin), need_fn


def _session_fingerprint(stencils, reslot, max_age: int,
                         recovery: bool, refless: bool = False) -> dict:
    """Solver-knob fingerprint for checkpoint compatibility: the knobs are
    not serializable, so save() records KINDS and restore() rejects a
    mismatched continuation (custom stencils/reslot can only be matched by
    kind — identical-kind custom objects are the caller's contract).
    planar_rebin/donate are bit-neutral and deliberately absent; the
    refless trigger IS recorded (it changes the rebin schedule, so a
    cross-posture restore would silently diverge — and a ref-based
    continuation cannot even be reconstructed from a refless artifact's
    placeholder planes)."""
    return {
        "solver": "fused-pallas" if stencils is None else "custom-stencils",
        "reslot": "default" if reslot is None else "custom",
        "max_age": max_age,
        "recovery": recovery,
        "refless": refless,
    }


def refless_trigger_default(grid: GridSpec2D) -> bool:
    """Auto-select the refless trigger at the very top of HBM: the
    ref-based step peaks at ~10 plane-footprints (8 resident + the
    forces kernel's ax/ay temps; the density output aliases the dead rho
    plane), which the 160M probe measured at 13.81 GiB — and the dispatch
    still RESOURCE_EXHAUSTED on the 16 GiB chip (the allocator's usable
    arena sits below the static-accounting peak).  Dropping the 2 ref
    planes puts the step at ~8 footprints (11.0 GiB at 160M) and the
    planar rebin at ~12.8.  Threshold: engage once the 10-plane estimate
    crosses 13.5 GiB — 160M is in, the 144M verified-clean posture is
    untouched."""
    plane_bytes = grid.ny_pad * grid.cap * grid.nx_pad * 4
    return plane_bytes * 10 > 13.5 * 1024 ** 3


def planar_rebin_default(grid: GridSpec2D) -> bool:
    """Auto-select the plane-at-a-time rebin near the HBM ceiling: the
    fused rebin peaks at ~13 dense plane-footprints (8 resident + 5 reslot
    outputs), which faulted at 128M particles on a 16 GiB chip — switch
    to planar once that estimate crowds the HBM (leaving headroom for
    kernel transients and the recovery collect)."""
    plane_bytes = grid.ny_pad * grid.cap * grid.nx_pad * 4
    return plane_bytes * 13 > 14 * 1024 ** 3


def segmented_run_default(grid: GridSpec2D) -> bool:
    """Auto-select the segmented run driver at the very top of HBM.

    The standard ``run`` scans ``cond(need, rebin) -> kernels``; XLA
    statically reserves one temp plane per rebin-cond output inside the
    scan (the untaken branch cannot alias the carry, and the scheduler
    overlaps the per-plane conds) — measured 4 extra plane-footprints, so
    the step program needs ~12 planes resident and compile-faults OOM at
    160M particles (8 x 1.38 GiB args + 5.52 GiB cond temps, 16.6 of
    15.75 GiB).  The segmented driver keeps the hot program cond-free
    (8 planes) and runs the rebin as its own donated dispatch; its cost
    is one host round-trip per segment (~27 ms on tunneled rigs), noise
    when steps take >100 ms but a 2x loss at 1M — hence ceiling-only."""
    plane_bytes = grid.ny_pad * grid.cap * grid.nx_pad * 4
    return plane_bytes * 12 + 600 * 1024 ** 2 > 15.5 * 1024 ** 3


def default_grid(params_h: float, x_min: float, x_max: float, y_max: float,
                 cap: int = 8, skin_factor: float = 1.5) -> GridSpec2D:
    """Binning grid with a Verlet skin: cells of skin_factor*h.

    Past the tb=8 single-buffer width edge (nx_pad ~6016, the 136M grid)
    the fused kernel's scoped VMEM crosses the 100 MiB gate at any DMA
    mode, so the grid drops to 4-row blocks there (bytes/lane scale ~tb;
    pallas_solver.pick_row_block)."""
    import dataclasses

    from . import pallas_solver

    g = GridSpec2D.from_bounds(h=params_h * skin_factor, x_min=x_min,
                               x_max=x_max, y_min=0.0, y_max=y_max, cap=cap)
    tb = pallas_solver.pick_row_block(g.nx_pad)
    return g if tb == g.row_block else dataclasses.replace(g, row_block=tb)


def multi_step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
               grid: GridSpec2D, n_steps: int, stencils=None,
               max_age: int = 64, reslot=None,
               spill_cap: int = SPILL_CAP):
    """n_steps with deferred rebinning; returns (FluidState, diag, rebins)
    where diag carries the cumulative dropped count (capacity overflow +
    reslot losses, the latter structurally 0).  Overflow recovery is on:
    capacity drops park in a ``spill_cap``-entry buffer and re-admit at
    later rebins when their cell frees up."""
    stepf = make_step(params, cfg, grid, stencils, max_age, reslot,
                      n=state.n)
    sim = init_dense(state, grid, spill_cap)
    n = state.n

    def body(s, _):
        return stepf(s), None
    sim, _ = jax.lax.scan(body, sim, None, length=n_steps)

    x, y, vx, vy, rho = extract_fields(sim, grid, params, n)
    out = state.replace(x=x, y=y, vx=vx, vy=vy, rho=rho,
                        p=eos_pressure(rho, params), step=sim.step)
    diag = grid_solver.StepDiag(overflow=sim.overflow + sim.lost)
    return out, diag, sim.rebin_count


class Session:
    """Persistent dense-resident run: step/render without per-call rebinning.

    ``multi_step`` re-bins from scratch and extracts per call (fixed ~25 ms
    at 1M) — fine for batch runs, wasteful for frame streaming.  A Session
    holds the DenseSim across calls: ``run(k)`` advances k steps in one
    dispatch, ``run_frame``/``frame`` rasterize the density field STRAIGHT
    from the dense state (zero per-particle data movement), and ``state()``
    materializes a FluidState only when actually asked.

    This is the engine behind BASELINE config #4 (1M sim + on-TPU render
    streaming) and the analog of the reference's persistent GPU buffers
    (reference: src/gpu/buffers.rs ParticleBuffers — seeded once, stepped
    in place)."""

    def __init__(self, state: FluidState, params: FluidParams,
                 cfg: IntegrateConfig, grid: GridSpec2D, stencils=None,
                 max_age: int = 64, reslot=None,
                 spill_cap: int = SPILL_CAP, init_chunks: int | None = None,
                 donate: bool = False, recovery: bool = True,
                 planar_rebin: bool | None = None,
                 segmented: bool | None = None,
                 refless_trigger: bool | None = None):
        """``init_chunks``/``donate`` are the very-large-N knobs (both
        matter past ~64M particles, where HBM — not compute — is the
        ceiling): ``init_chunks=K`` builds the dense state with the
        chunked init (O(N/K) transients instead of the full-[N] sort
        workspace, bitwise-identical result); ``donate=True`` donates the
        resident sim into ``run``'s dispatch so old and new dense planes
        never coexist (halves steady-state footprint; any outside
        reference to a previous ``sess.sim`` is invalidated — snapshot
        via ``save``/``state()`` instead of holding the pytree).  It also
        donates ``state`` into the init dispatch — under donate=True the
        Session owns the particle planes from construction on; don't
        reuse ``state`` afterwards.

        ``recovery=False`` reverts overflow handling to the counted-loss
        contract (``make_step``'s ``n=None``: drops are counted, never
        collected or re-admitted; the init leaves the spill buffer empty
        per the recovery-off contract).  The recovery pass keeps the
        five pre-rebin planes alive through its collect step, raising
        the rebin-peak HBM footprint — turn it off when a scene at the
        very top of the HBM range is expected to overflow.

        ``planar_rebin`` selects the plane-at-a-time rebin (bit-identical
        results, lower rebin-peak HBM, slightly more per-rebin launches —
        see make_step).  Default ``None`` auto-enables it when the fused
        rebin's ~13 plane-footprint peak would crowd a 16 GiB chip
        (the observed 128M fused fault, BASELINE.json
        round3_memory_ceiling).

        ``segmented`` selects the segmented run driver (bit-identical
        trajectory; the rebin cond leaves the hot program, cutting ~4
        temp plane-footprints at the cost of one host round-trip per
        rebin segment).  Default ``None`` auto-enables it where the
        standard program's static temps would compile-fault OOM
        (``segmented_run_default``; measured at 160M particles).

        ``refless_trigger`` drops the two rebin-reference planes and
        accumulates a conservative per-step displacement bound instead
        (NOT bitwise vs the ref-based trigger — rebins fire somewhat
        earlier; physics identical).  Default ``None`` auto-enables at
        the very top of HBM (``refless_trigger_default``; the measured
        160M RESOURCE_EXHAUSTED margin)."""
        self._setup(params, cfg, grid, state.n, stencils, max_age, reslot,
                    donate=donate, recovery=recovery,
                    planar_rebin=planar_rebin, segmented=segmented,
                    refless_trigger=refless_trigger)
        # donate the [N] input planes into the init dispatch too: at the
        # HBM ceiling (>=144M) the four state planes + their padded chunk
        # copies coexisting with the dense carry planes is several GiB of
        # avoidable init-peak (callers under donate=True already treat
        # `state` as consumed — Session is the owner from here on)
        init_donate = (0,) if donate else ()
        self._spill_cap = spill_cap
        self._init_chunks = init_chunks
        if init_chunks is not None:
            self.sim = jax.jit(partial(
                init_dense_chunked, grid=self.grid, n_chunks=init_chunks,
                spill_cap=spill_cap, collect_spill=recovery),
                donate_argnums=init_donate)(state)
        else:
            self.sim = jax.jit(partial(
                init_dense, grid=self.grid, spill_cap=spill_cap,
                collect_spill=recovery), donate_argnums=init_donate)(state)
        self._apply_refless()

    def _apply_refless(self) -> None:
        """Refless posture: swap the freshly-initialized ref planes for
        (1,1,1) placeholders so the two plane-footprints free immediately
        (the step never reads them; see make_step_parts)."""
        if self.refless_trigger:
            self.sim = dataclasses.replace(
                self.sim, ref_xd=_ref_placeholder(),
                ref_yd=_ref_placeholder())

    def reset(self, state: FluidState) -> None:
        """Re-seed the resident DenseSim from a per-particle FluidState
        (fresh binning; the deferred-rebin age/skin references restart, the
        step counter continues from ``state.step``).  Reuses every compiled
        step/frame program — the Simulation facade's state-setter path."""
        if state.n != self.n:
            raise ValueError(f"reset with n={state.n}, Session built for "
                             f"n={self.n}")
        init = (init_dense if self._init_chunks is None
                else partial(init_dense_chunked,
                             n_chunks=self._init_chunks))
        self.sim = jax.jit(partial(
            init, grid=self.grid, spill_cap=self._spill_cap,
            collect_spill=self._recovery))(state)
        self._apply_refless()

    @classmethod
    def from_generator(cls, gen, n: int, params: FluidParams,
                       cfg: IntegrateConfig, grid: GridSpec2D, stencils=None,
                       max_age: int = 64, reslot=None,
                       spill_cap: int = SPILL_CAP, init_chunks: int = 16,
                       donate: bool = True, recovery: bool = True,
                       planar_rebin: bool | None = None,
                       segmented: bool | None = None,
                       refless_trigger: bool | None = None) -> "Session":
        """Session whose initial scene is COMPUTED chunk-by-chunk by
        ``gen`` (see ``init_dense_gen``) instead of binned from a
        materialized FluidState — the top-of-HBM init path: no [N]
        particle planes ever exist on device (e.g.
        ``core.state.lattice_gen`` for the reference's init_grid
        lattice).  Defaults flip to the very-large-N posture
        (``init_chunks=16``, ``donate=True``)."""
        self = cls.__new__(cls)
        self._setup(params, cfg, grid, n, stencils, max_age, reslot,
                    donate=donate, recovery=recovery,
                    planar_rebin=planar_rebin, segmented=segmented,
                    refless_trigger=refless_trigger)
        self._spill_cap = spill_cap
        self._init_chunks = init_chunks
        self.sim = jax.jit(partial(
            init_dense_gen, gen, n, grid=grid, n_chunks=init_chunks,
            spill_cap=spill_cap, collect_spill=recovery))()
        self._apply_refless()
        return self

    def _setup(self, params: FluidParams, cfg: IntegrateConfig,
               grid: GridSpec2D, n: int, stencils, max_age: int,
               reslot, donate: bool = False, recovery: bool = True,
               planar_rebin: bool | None = None,
               segmented: bool | None = None,
               refless_trigger: bool | None = None) -> None:
        from ..render import raster

        if planar_rebin is None:
            planar_rebin = planar_rebin_default(grid)
        if refless_trigger is None:
            refless_trigger = refless_trigger_default(grid)
        self.refless_trigger = refless_trigger
        at_hbm_wall = segmented_run_default(grid)
        if segmented is None:
            segmented = at_hbm_wall
        self.segmented = segmented
        if at_hbm_wall and stencils is None:
            # the fused forces+integrate kernel emits 4 fresh planes while
            # still reading the old ones — 4 temp plane-footprints the
            # program cannot shed, the other half of the 160M compile OOM
            # (the rebin-cond temps being the half `segmented` sheds).
            # The two-kernel tail needs only ax/ay (2 temps) and its XLA
            # elementwise integrate can reuse the dying input buffers.
            stencils = pallas_solver.make_stencils(grid)
        self.params = params
        self.cfg = cfg
        self.grid = grid
        self.n = n
        self.planar_rebin = planar_rebin
        self._recovery = recovery
        self._spill_cap = SPILL_CAP     # __init__/from_generator override
        self._init_chunks = None
        self._fingerprint = _session_fingerprint(stencils, reslot, max_age,
                                                 recovery, refless_trigger)
        pure_step, rebin_fn, need_fn = make_step_parts(
            params, cfg, grid, stencils, max_age, reslot,
            n=n if recovery else None, planar=planar_rebin,
            refless=refless_trigger)
        self._parts = (pure_step, rebin_fn, need_fn)
        # enough to rebuild variants of the parts (the segmented driver's
        # donor-chain rebin); captures the post-adjustment stencils
        self._parts_kw = dict(stencils=stencils, max_age=max_age,
                              reslot=reslot, n=n if recovery else None)
        self._donate = donate
        self._segmented_fns = None   # built lazily on first segmented run

        def stepf(sim):
            sim = jax.lax.cond(need_fn(sim), rebin_fn, lambda s: s, sim)
            return pure_step(sim)

        @partial(jax.jit, static_argnums=1,
                 donate_argnums=(0,) if donate else ())
        def run_k(sim, k):
            return jax.lax.scan(lambda s, _: (stepf(s), None), sim, None,
                                length=k)[0]

        @partial(jax.jit, static_argnums=(1, 2, 3))
        def run_frame(sim, k, ppc, mode):
            sim = jax.lax.scan(lambda s, _: (stepf(s), None), sim, None,
                               length=k)[0]
            return sim, raster.field_frame(sim.xd, sim.yd, params, grid,
                                           px_per_cell=ppc, mode=mode)

        @partial(jax.jit, static_argnums=(1, 2, 3, 4),
                 donate_argnums=(0,) if donate else ())
        def run_frames(sim, f, k, ppc, mode):
            def body(s, _):
                s = jax.lax.scan(lambda s2, _: (stepf(s2), None), s, None,
                                 length=k)[0]
                return s, raster.field_frame(s.xd, s.yd, params, grid,
                                             px_per_cell=ppc, mode=mode)
            return jax.lax.scan(body, sim, None, length=f)

        @partial(jax.jit, static_argnums=(1, 2))
        def frame_only(sim, ppc, mode):
            return raster.field_frame(sim.xd, sim.yd, params, grid,
                                      px_per_cell=ppc, mode=mode)

        @jax.jit
        def kick(sim, cx, cy, ux, uy, imp):
            from ..interact.impulse import apply_impulse_arrays
            vxd, vyd = apply_impulse_arrays(sim.xd, sim.yd, sim.vxd,
                                            sim.vyd, cx, cy, ux, uy, imp)
            live = sim.xd < FAR * 0.5
            return dataclasses.replace(sim,
                                       vxd=jnp.where(live, vxd, 0.0),
                                       vyd=jnp.where(live, vyd, 0.0))

        self._run_k = run_k
        self._run_frame = run_frame
        self._run_frames = run_frames
        self._frame = frame_only
        self._kick = kick
        self._extract = jax.jit(
            lambda sim: extract_fields(sim, grid, params, n))

    def run(self, n_steps: int, chunk: int | None = None) -> None:
        """Advance n_steps on-device (one compiled dispatch).

        ``chunk=K`` splits the work into ceil(n/K) sequential K-step
        dispatches (one compiled program, reused).  Use it when a single
        dispatch's wall time would exceed the transport's RPC deadline:
        tunneled rigs fault long dispatches with an UNAVAILABLE device
        error around the ~60 s mark (measured at 128M particles: 300-step
        ≈60 s dispatches fault, the same program in 150-step ≈30 s chunks
        runs clean).  Direct-attached chips don't need it."""
        if self.segmented:
            self._run_segmented(n_steps, chunk)
            return
        if chunk is None or chunk >= n_steps:
            self.sim = self._run_k(self.sim, n_steps)
            return
        done = 0
        while done < n_steps:
            k = min(chunk, n_steps - done)
            self.sim = self._run_k(self.sim, k)
            done += k

    def _segmented_build(self):
        if self._segmented_fns is None:
            pure_step, rebin_fn, need_fn = self._parts
            dn = (0,) if self._donate else ()

            @partial(jax.jit, donate_argnums=dn)
            def step_until(sim, k):
                """Pure steps (NO rebin cond in the program — no cond temp
                planes) until the skin/age trigger fires or k steps done.
                Returns (sim, steps_done, trigger_pending)."""
                def go(c):
                    s, i = c
                    return jnp.logical_and(~need_fn(s), i < k)

                def body(c):
                    s, i = c
                    return pure_step(s), i + 1

                sim, i = jax.lax.while_loop(go, body, (sim, jnp.int32(0)))
                return sim, i, need_fn(sim)

            rotated = (self._donate and self.refless_trigger
                       and self.planar_rebin)
            if rotated:
                # Donor-chain rebin (see make_step_parts donors=True): the
                # planes ride POSITIONALLY with rho FIRST, so jax's greedy
                # donation pairing (first-fit by aval in flatten order)
                # lands each apply output exactly on the kernel-declared
                # donor: new_xd->rho's buffer, new_yd->xd's, ... and
                # new_idx->vyd's (kernel bitcast alias; s32 never
                # self-pairs because idx_d is NOT donated).  A whole-
                # DenseSim rebin would self-pair xd->xd etc., which a
                # halo-DMA kernel cannot satisfy in place — XLA resolves
                # it with full-plane input copies (2-4 planes; the
                # probe-measured 192M rebin RESOURCE_EXHAUSTED).
                _, rebin_rot, _ = _build_step(
                    self.params, self.cfg, self.grid,
                    self._parts_kw["stencils"], self._parts_kw["max_age"],
                    self._parts_kw["reslot"], self._parts_kw["n"],
                    planar=True, refless=True, donors=True)

                @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
                def rebin_one(rho_d, xd, yd, vxd, vyd, idx_d, rest):
                    (occ, disp2, age, overflow, lost, rebin_count, step,
                     sx, sy, svx, svy, sidx, readmitted) = rest
                    sim = DenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd,
                                   rho_d=rho_d,
                                   ref_xd=_ref_placeholder(),
                                   ref_yd=_ref_placeholder(),
                                   idx_d=idx_d, occ=occ, disp2=disp2,
                                   age=age, overflow=overflow, lost=lost,
                                   rebin_count=rebin_count, step=step,
                                   sx=sx, sy=sy, svx=svx, svy=svy,
                                   sidx=sidx, readmitted=readmitted)
                    return rebin_rot(sim)

                shape = (self.grid.ny_pad, self.grid.cap, self.grid.nx_pad)
                self._rho_zeros = jax.jit(
                    lambda: jnp.zeros(shape, jnp.float32))
            else:
                @partial(jax.jit, donate_argnums=dn)
                def rebin_one(sim):
                    return rebin_fn(sim)

            self._segmented_fns = (step_until, rebin_one, rotated)
        return self._segmented_fns

    def _run_segmented(self, n_steps: int, chunk: int | None) -> None:
        """The HBM-ceiling run driver (see segmented_run_default): the
        rebin runs as its OWN donated dispatch at the jit top level —
        aliasing works there, so the peak stays near the 8 resident
        planes — and the hot while_loop program carries no rebin cond at
        all.  The trajectory is BITWISE the standard scan's: a rebin is
        dispatched exactly when a step's pre-check would have taken the
        cond branch (a segment ending at its step bound with the trigger
        clear just continues in the next dispatch)."""
        step_until, rebin_one, rotated = self._segmented_build()
        cap = n_steps if chunk is None else chunk
        done = 0
        while done < n_steps:
            k = min(cap, n_steps - done)
            self.sim, did, need = step_until(self.sim, jnp.int32(k))
            done += int(did)
            if done < n_steps and bool(need):
                if rotated:
                    s = self.sim
                    rest = (s.occ, s.disp2, s.age, s.overflow, s.lost,
                            s.rebin_count, s.step, s.sx, s.sy, s.svx,
                            s.svy, s.sidx, s.readmitted)
                    out = rebin_one(s.rho_d, s.xd, s.yd, s.vxd, s.vyd,
                                    s.idx_d, rest)
                    del s
                    self.sim = None     # drop idx ref before fresh rho
                    # drain the rebin before allocating the fresh rho (the
                    # async zeros dispatch otherwise overlaps the rebin's
                    # still-live non-donated input + temps; the sharded
                    # twin measured exactly this OOM at 160M/device)
                    jax.block_until_ready(out.xd)
                    self.sim = dataclasses.replace(
                        out, rho_d=self._rho_zeros())
                else:
                    self.sim = rebin_one(self.sim)

    def run_frame(self, substeps: int = 16, px_per_cell: int = 2,
                  mode: str = "density"):
        """substeps + field raster in ONE jitted dispatch (the production
        frame loop; dispatch latency is the FPS ceiling on tunneled rigs).
        Returns the uint8 RGB frame."""
        self.sim, img = self._run_frame(self.sim, substeps, px_per_cell,
                                        mode)
        return img

    def run_frames(self, n_frames: int, substeps: int = 16,
                   px_per_cell: int = 2, mode: str = "density"):
        """``n_frames`` frames in ONE dispatch: a scan of (substeps steps +
        field raster) per frame, returning the stacked uint8
        ``[n_frames, H, W, 3]`` RGB batch.  The trajectory is BITWISE the
        one ``n_frames`` sequential ``run_frame`` calls walk; frame bytes
        agree to ±1 (a colormap f32->uint8 rounding boundary may resolve
        differently in the two separately compiled programs).  The
        per-dispatch transport latency (and the per-pull host-transfer
        latency, if the caller converts the stack in one ``np.asarray``)
        amortizes over the whole batch instead of taxing every frame.  This is the
        throughput frame path (offline export, video encode, bench
        cadence); per-frame ``run_frame`` remains the latency path for
        interactive loops.  Device footprint: n_frames * H * W * 3 bytes
        — size batches accordingly at large rasters."""
        self.sim, imgs = self._run_frames(self.sim, n_frames, substeps,
                                          px_per_cell, mode)
        return imgs

    def frame(self, px_per_cell: int = 2, mode: str = "density"):
        """uint8 RGB frame of the resident state (no stepping)."""
        return self._frame(self.sim, px_per_cell, mode)

    def kick(self, x: float, y: float, dir_x: float, dir_y: float,
             impulse: float = 10.0) -> None:
        """Drag-impulse injection straight on the resident dense state
        (reference semantics: apply_drag, examples/sph2d_cpu_demo.rs:
        112-141) — interaction at 1M+ scale without materializing a
        per-particle state."""
        self.sim = self._kick(self.sim, x, y, dir_x, dir_y, impulse)

    def state(self) -> FluidState:
        """Materialize the per-particle FluidState (on demand only)."""
        x, y, vx, vy, rho = self._extract(self.sim)
        return FluidState(
            x=x, y=y, vx=vx, vy=vy,
            ax=jnp.zeros_like(x), ay=jnp.zeros_like(x),
            rho=rho, p=eos_pressure(rho, self.params), step=self.sim.step)

    def save(self, path: str) -> None:
        """Snapshot the RESIDENT DenseSim (slot structure, skin references,
        rebin counters) + grid/params/cfg.  ``Session.restore`` continues
        bitwise-identically to an uninterrupted run — unlike
        ``Simulation.save``, which goes through an extracted FluidState and
        would re-sort + reset the deferred-rebin state on load.  (The
        reference's only snapshot was its CPU readback mirror,
        reference: examples/gpu_demo.rs:116-127.)"""
        from ..utils import checkpoint
        checkpoint.save_dense(path, self.sim, self.grid, self.params,
                              self.cfg, self.n,
                              fingerprint=self._fingerprint)

    @classmethod
    def restore(cls, path: str, stencils=None, max_age: int = 64,
                reslot=None, recovery: bool = True,
                planar_rebin: bool | None = None,
                segmented: bool | None = None,
                refless_trigger: bool | None = None,
                donate: bool = False) -> "Session":
        """Rebuild a Session from ``save``.  Non-serializable knobs
        (stencils / reslot backend, max_age, recovery, refless_trigger)
        are re-supplied here and must match the saved run's for bitwise
        continuation — a MISMATCH against the artifact's fingerprint
        raises instead of silently diverging (legacy artifacts without
        one are accepted unchecked; ``planar_rebin`` is bit-neutral
        either way).  ``refless_trigger=None`` resolves to the grid's
        auto default BEFORE the fingerprint check, so ceiling-posture
        artifacts restore without re-supplying the knob.  ``donate``
        (bit-neutral, like planar_rebin) should be re-armed when
        continuing a ceiling-posture run — without it the donor-chain
        rebin and donated dispatches fall back to the copying forms,
        which RESOURCE_EXHAUST at the sizes those postures exist for."""
        from ..utils import checkpoint
        sim, grid, params, cfg, n = checkpoint.load_dense(path)
        if refless_trigger is None:
            refless_trigger = refless_trigger_default(grid)
        checkpoint.check_fingerprint(
            checkpoint.load_fingerprint(path),
            _session_fingerprint(stencils, reslot, max_age, recovery,
                                 refless_trigger),
            "Session.restore")
        self = cls.__new__(cls)
        self._setup(params, cfg, grid, n, stencils, max_age, reslot,
                    donate=donate, recovery=recovery,
                    planar_rebin=planar_rebin,
                    segmented=segmented, refless_trigger=refless_trigger)
        self.sim = sim
        return self

    @property
    def overflow(self) -> int:
        """Cumulative capacity drops (recoverable ones included)."""
        return int(self.sim.overflow + self.sim.lost)

    @property
    def suspended(self) -> int:
        """Particles currently parked in the spill buffer (awaiting
        re-admission at a future rebin)."""
        return int(self.sim.suspended)

    @property
    def readmitted(self) -> int:
        """Cumulative overflow recoveries (spill re-admissions)."""
        return int(self.sim.readmitted)
