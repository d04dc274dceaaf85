"""Multi-chip verlet: deferred rebinning on spatially-decomposed slabs.

Combines the two fastest designs in the framework:

* the slab decomposition of ``parallel/shard.py`` (one x-slab per device,
  nearest-neighbour ``ppermute`` halos), and
* the deferred-rebinning scheme of ``models/verlet_solver.py`` (state stays
  dense between rebins; slot assignment frozen under a Verlet skin).

Key observation: the two compose cleanly.  Between rebins, only the VALUES in
the neighbour's edge column change, not the slot structure — so per-step ICI
traffic is two ghost-column exchanges (one stacked [4, ny_pad, cap, 1]
ppermute pair for x/y/vx/vy before density, one for rho after — a few
hundred KB total) and an any-device-reduced rebin trigger read
from the tiny per-device disp2 scalars at the jit level.

The rebin itself is the same sort-free LOCAL reslot as the single-chip
flagship (ops/reslot.py), extended with ghost-column capture for migration:
the reslot's cell clip is widened to [-1, nx], so a particle that drifted off
the slab lands in the ghost column of its exit side; those two columns are
exchanged with the neighbours (one ppermute pair) and merged into the
receiver's edge cells by a cap-bounded one-hot append.  No sorts, no
scatters, no per-particle extraction anywhere on the step path — the old
design (gather every particle, pack/exchange migrant buffers, re-sort the
slab) cost ~40 ms per rebin at 1M where this costs ~2 ms.

Rebinning must be COLLECTIVE (migration is an exchange), so the per-device
skin trigger is any-reduced across devices (outside shard_map, over the
[D] disp2/age vectors) and all devices take the rebin branch together.
The rebin lax.cond lives at the JIT level over the scan carry, so the
untaken branch aliases the carry instead of copying every plane (the
old inside-shard_map cond cost ~0.3 ms/step at 1M doing exactly that).

Per-particle identity is first-class: a dense int32 idx plane (the original
particle index, globally unique — the analog of the reference's stable SSBO
array index its parity harnesses compare by, reference:
examples/gpu_parity10.rs:104-139) rides through reslot, the ghost-column
exchange (bitcast to f32 so one ppermute pair still moves everything), and
the edge-cell merge.  ``extract_fluid_state`` returns the ORIGINAL-order
FluidState on demand, so multi-chip runs are checkpointable and parity-
gateable particle-i-to-particle-i; ``extract_state`` keeps the cheaper
per-device compacted view for rendering.

Edge devices merge their own outward ghost captures back into the adjacent
real edge cell: the global bounce box clamps x into the domain, so a
boundary-exact position that cells one past the slab is physically IN the
edge cell, not an exit.

Overflow RECOVERY (the single-chip flagship's spill semantics, sharded):
pass ``n`` to ``make_sharded_verlet_step`` and every particle that
disappears at a collective rebin — local reslot capacity/window losses AND
migration arrivals dropped by a full edge cell — parks in a per-device
spill buffer (state frozen, no forces) instead of vanishing.  Later rebins
re-admit entries whose target cell has freed up, gated on the skin
invariant (|v| dt <= skin_half; ballistic runaways stay suspended) and on
the frozen position lying inside this device's slab.  Everything is local
per device (no collectives in the recovery branch) and cond-gated, so
overflow-0 scenes pay only the predicate.  Suspended particles surface in
``extract_state``/``extract_fluid_state`` at their frozen positions.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.params import FluidParams, IntegrateConfig, GRAVITY_Y
from ..core.state import FluidState
from ..ops.binning import FAR, bin_particles, to_dense
from ..ops.kernels import eos_pressure, self_density
from ..ops import reslot as reslot_ops
from ..models import grid_solver
from . import shard as sh

AXIS = sh.AXIS


SPILL_CAP = 256  # default per-device spill-buffer entries


@partial(jax.tree_util.register_dataclass,
         data_fields=("xd", "yd", "vxd", "vyd", "rho_d", "ref_xd", "ref_yd",
                      "idx_d", "occ", "disp2", "alive", "age", "overflow",
                      "lost", "dropped", "rebin_count", "step",
                      "sx", "sy", "svx", "svy", "sidx", "readmitted"),
         meta_fields=())
@dataclasses.dataclass
class ShardedDenseSim:
    """Per-device dense-resident state, all leaves with a leading
    [n_devices] axis (sharded on it): dense fields [D, ny_pad, cap,
    nxl_pad]; int32 per-device counters [D]; step: global scalar.

    idx_d:    int32 original (global) particle index per slot, -1 = empty —
              identity through migration and rebinning
    occ:      int32[D, 3, n_row_blocks] cached block_kmax3 slot-loop bounds,
              computed once per rebin and elementwise-MAXed with both
              neighbours' (the per-step ghost-column fill makes ghost-lane
              occupancy up to the neighbour's bound; max keeps the cached
              bound a superset, so skipped slots are provably FAR)
    disp2:    f32[D] max squared displacement of real columns from the
              rebin reference, computed at the end of the previous step
              (in-kernel on the fused path) — the any-reduced trigger reads it
    alive:    live particles currently resident on the device
    overflow: cumulative cell-capacity losses (reslot matches beyond cap)
    lost:     cumulative reslot window misses (structurally 0 — diagnostic)
    dropped:  cumulative migration losses (edge-cell merge beyond cap)
    sx/sy/svx/svy/sidx: [D, spill_cap] per-device SPILL buffer (frozen
              state of dropped particles awaiting re-admission; sidx -1 =
              empty — see module docstring, recovery semantics)
    readmitted: [D] cumulative spill re-admissions
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
    alive: jax.Array
    age: jax.Array
    overflow: jax.Array
    lost: jax.Array
    dropped: jax.Array
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
        """Particles currently parked in spill buffers (all devices)."""
        return jnp.sum(self.sidx >= 0).astype(jnp.int32)


def make_sharded_verlet_step(params: FluidParams, cfg: IntegrateConfig,
                             spec: sh.ShardSpec, mesh: Mesh, stencils=None,
                             max_age: int = 64, reslot=None,
                             fused: bool = False, interpret=None,
                             n: int | None = None,
                             spill_cap: int = SPILL_CAP,
                             planar: bool = False,
                             init_chunks: int | None = None,
                             refless: bool = False,
                             gen=None, gen_n: int | None = None):
    """Returns (init_fn, step_fn):
    init_fn(ShardedState) -> ShardedDenseSim (jitted)
    step_fn(ShardedDenseSim) -> ShardedDenseSim (jitted)

    Requires spec.local_grid.cell_size > params.h (build the spec with
    ``h * skin_factor``).

    ``fused=True`` is the hardware production shape: Pallas density + the
    FUSED forces+integrate+trigger kernel (accelerations never reach HBM;
    the skin trigger reads per-device disp2 scalars the kernel epilogue
    wrote, with ghost-column lanes masked out of the displacement max).
    The default keeps the unfused ``stencils`` path (XLA stencils = the CI
    reference).

    ``n`` (the GLOBAL particle count) enables per-device overflow RECOVERY
    at collective rebins (spill collection + skin-gated re-admission, see
    module docstring); with ``n=None`` losses are counted but the spill
    buffers are never refilled or drained.

    At D=1 the rebin skips the capture/exchange/merge pipeline entirely
    (slab exits are impossible under the global bounce box) and the default
    ``reslot`` uses the single-chip clip; a CUSTOM ``reslot`` passed for a
    D=1 mesh must therefore also use the plain [0, nx-1] clip — ghost-
    column captures would go unmerged.

    ``planar=True`` routes the default rebin through the plane-at-a-time
    reslot (ops/reslot.reslot_planar: select once, then one apply kernel
    per payload plane) — bit-identical slot assignments and capture
    columns, but the rebin never holds all five input + five output
    payload planes at once (the HBM-ceiling mode, the sharded twin of
    Session(planar_rebin=True)).  ``init_chunks=K`` builds each device's
    dense planes by scanning K chunk slices of its local particle buffer
    (O(m/K) sort transients instead of the full-[m] argsort workspace;
    bitwise-identical result) — the per-device twin of
    Session(init_chunks=K) for >=~64M particles per device.

    ``refless=True`` is the sharded REFLESS trigger (the twin of
    Session(refless_trigger=True), see models/verlet_solver.
    make_step_parts): the per-device rebin-reference planes become
    [D, 1, 1, 1] placeholders (-2 plane-footprints per device) and the
    per-device ``disp2`` accumulates the conservative sum of per-step
    displacement maxima; the collective trigger any-reduces the
    accumulated bounds.  NOT bitwise vs the ref-based trigger (earlier
    rebin schedule); physics identical.

    ``gen``/``gen_n`` switch init to the GENERATOR path (the sharded twin
    of Session.from_generator): ``init_fn(step_scalar)`` computes the
    scene chunk-by-chunk per device from ``gen(global_indices)`` — no [N]
    FluidState and no [D, capacity] ShardedState ever exist on device.
    At the per-device HBM ceiling those two inputs are ~6-8 GiB that
    coexist with the dense planes (the 128M/device init
    RESOURCE_EXHAUSTED); the generator path's init peak is the dense
    carry plus O(gen_n / init_chunks) transients.  Bitwise-identical to
    the shard_state + chunked-init result (same stable-rank machinery;
    slab membership uses shard_state's own floor-divide test)."""
    from ..models import pallas_solver

    g = spec.local_grid
    D = spec.n_devices
    nxl = spec.nx_local
    cap = g.cap
    if fused:
        density_fn, _ = pallas_solver.make_stencils(g, interpret=interpret)
        forces_fn = None
    else:
        if stencils is None:
            stencils = grid_solver.XLA_STENCILS
        density_fn, forces_fn = stencils
    if reslot is None:
        # D>1: clip widened to [-1, nx] so slab exits are CAPTURED into the
        # ghost columns for migration.  D=1: the plain single-chip clip —
        # the global bounce box keeps every particle inside the (padded)
        # slab, so captures are impossible and the whole
        # capture/exchange/merge pipeline is skipped (measured: the capture
        # glue made the D=1 rebin branch ~2.9x the flagship's).
        clip_kw = dict(clip_lo=-1, clip_hi=g.nx) if D > 1 else {}
        if planar:
            _interp = reslot_ops._interpret_default() \
                if interpret is None else interpret

            def reslot(xd, yd, vxd, vyd, idx_d, origin=None):
                return reslot_ops.reslot_planar(
                    xd, yd, vxd, vyd, idx_d, g, interpret=_interp,
                    origin=origin, **clip_kw)
        else:
            reslot = reslot_ops.make_reslot(
                g, use_pallas=not reslot_ops._interpret_default(),
                **clip_kw)
    skin_half = (g.cell_size - params.h) * 0.5

    def origin_of(d):
        return (spec.global_x0 + d.astype(jnp.float32) * spec.slab_width,
                g.origin_y)

    def bin_local(x, y, vx, vy, idx, alive):
        d = jax.lax.axis_index(AXIS)
        xb = jnp.where(alive, x, FAR)
        yb = jnp.where(alive, y, FAR)
        b = bin_particles(xb, yb, g, alive=alive, origin=origin_of(d),
                          with_csr=False)
        xd = to_dense(b, xb, fill=FAR)
        yd = to_dense(b, yb, fill=FAR)
        vxd = to_dense(b, jnp.where(alive, vx, 0.0), fill=0.0)
        vyd = to_dense(b, jnp.where(alive, vy, 0.0), fill=0.0)
        idxd = to_dense(b, jnp.where(alive, idx, -1), fill=-1)
        return b, xd, yd, vxd, vyd, idxd

    def clear_ghost_cols(a, fill):
        a = jax.lax.dynamic_update_slice_in_dim(
            a, jnp.full(a.shape[:2] + (1,), fill, a.dtype), 0, axis=2)
        return jax.lax.dynamic_update_slice_in_dim(
            a, jnp.full(a.shape[:2] + (1,), fill, a.dtype), nxl + 1, axis=2)

    def count_live(xd):
        return jnp.sum(xd < FAR * 0.5).astype(jnp.int32)

    def occ_of(xd):
        """Cached slot-loop bounds: local block_kmax3 maxed with both
        neighbours' (ghost-lane occupancy after a per-step halo fill is
        bounded by the neighbour's bound)."""
        occ = reslot_ops.block_kmax3(xd, g)
        if D > 1:
            from_left = jax.lax.ppermute(occ, AXIS, sh._fwd_perm(D))
            from_right = jax.lax.ppermute(occ, AXIS, sh._bwd_perm(D))
            occ = jnp.maximum(occ, jnp.maximum(from_left, from_right))
        return occ

    def merge_col(fields, lane, src, base_cnt):
        """Append src occupants ([F, ny_pad, cap] f32 planes, plane 0 = x,
        FAR = dead; idx rides bitcast) into column ``lane`` of the dense
        fields (len(fields) == F, same plane order) at ranks continuing
        from base_cnt.  Returns (fields, drop_mask [ny_pad, cap]) — the
        mask marks src entries beyond cell capacity (the receiver's
        recovery path collects them; callers sum it for the count)."""
        cols = [f[:, :, lane] for f in fields]          # [ny_pad, cap] each
        acc = jnp.minimum(base_cnt, cap)                # [ny_pad]
        kio = jnp.arange(cap, dtype=jnp.int32)[None, :]
        dmask = []
        for k in range(cap):
            live_k = src[0, :, k] < FAR * 0.5           # [ny_pad]
            dest = jnp.where(live_k, acc, -1)
            oh = dest[:, None] == kio                   # [ny_pad, cap]
            cols = [jnp.where(oh, src[i, :, k][:, None], c)
                    for i, c in enumerate(cols)]
            dmask.append(live_k & (acc >= cap))
            acc = acc + live_k
        fields = [f.at[:, :, lane].set(c) for f, c in zip(fields, cols)]
        return fields, jnp.stack(dmask, axis=-1)        # [ny_pad, cap]

    vmax2 = (skin_half / cfg.dt) ** 2

    def _sh_recover(ops):
        """Per-device spill recovery at a collective rebin (inside
        lax.cond; NO collectives — the predicate may diverge per device).
        Mirrors models/verlet_solver._spill_recover with two sharded
        twists: candidates come from THREE sources (local reslot losses
        via presence-diff against post+exports; the two edge-merge drop
        masks), and re-admission additionally requires the frozen position
        to lie inside THIS slab (the in-slab check is a safety net: every
        collected source is in-slab by construction except ballistic
        window losses, which the |v| gate already suspends)."""
        (xd, yd, vxd, vyd, idx_d, pxd, pyd, pvxd, pvyd, pidx_d,
         exi_l, exi_r, dm1, src1, dmn, srcn, ox,
         sx, sy, svx, svy, sidx, readmitted) = ops
        K = sx.shape[0]

        # presence: post-rebin residents + my exports (the receiver
        # accounts for merged/dropped arrivals).  Tested WINDOW-locally,
        # not via an [n] presence mask: reslot placement is ±1-local in
        # cells and merge_col only reshuffles slots within a cell, so a
        # surviving resident's id sits within the 3x3 cell window of its
        # pre slot; an exported id sits in the export column at its
        # post-reslot row (±1 of its pre row — column is irrelevant, ids
        # are unique).  Exactly equivalent to the global membership test
        # (ids are unique and placement is local) without the
        # [n]-scatter + dense gather, which cost seconds of random
        # access and [n]+dense transients per recovery rebin at large
        # slabs.  Same memory shape as the single-chip twin
        # (models/verlet_solver._spill_recover): fori over the 9 shifts
        # bounds liveness to one shifted window, and the cap-membership
        # test is a broadcast-compare ``any`` reduce — per-slot sublane
        # slices would each materialize a layout-changing copy (the cap
        # axis is the (8,128) tile's sublane dim) and blow the rebin-peak
        # HBM at large slabs.
        R, _, C = pidx_d.shape

        # per-SLOT window test (same union, loops reordered): padding the
        # whole idx plane materialized [R+2, cap, C+2] PLUS its remat
        # copies — 2.8 GiB of the recovery cond's arena at 160M/device,
        # the exact 160 MB-over-HBM margin of the sharded 160M bracket.
        # Slicing slot k BEFORE padding keeps every temp <= [R, 1, C]
        # (the taken_mask memory shape, ops/reslot.py).
        def _slot_any(k, found):
            slot = jax.lax.dynamic_slice(idx_d, (0, k, 0), (R, 1, C))
            pslot = jnp.pad(slot, ((1, 1), (0, 0), (1, 1)),
                            constant_values=-1)

            def _shift(s, fd):
                win = jax.lax.dynamic_slice(pslot, (s // 3, 0, s % 3),
                                            (R, 1, C))
                return fd | (pidx_d == win)

            return jax.lax.fori_loop(0, 9, _shift, found)

        found = jax.lax.fori_loop(0, cap, _slot_any,
                                  jnp.zeros(pidx_d.shape, bool))
        exp_pad = jnp.pad(jnp.stack([exi_l, exi_r]),
                          ((0, 0), (1, 1), (0, 0)), constant_values=-1)

        def _exp_any(s, found):
            # s in 0..5: export side s // 3, row shift s % 3; membership
            # over the export column's cap slots as a broadcast any
            ex_sh = jax.lax.dynamic_slice(exp_pad, (s // 3, s % 3, 0),
                                          (1, R, cap))[0]
            return found | jnp.any(
                pidx_d[:, :, None, :] == ex_sh[:, None, :, None], axis=2)

        found = jax.lax.fori_loop(0, 6, _exp_any, found)
        pre = pidx_d.reshape(-1)
        gone = (pre >= 0) & ~found.reshape(-1)

        def collect(mask_flat, planes_flat, count_hint):
            # hierarchical first-K (verlet_solver._first_k_flat): the flat
            # nonzero's two [total]-sized int32 temps dominate the recovery
            # rebin's HLO temps at large slabs
            from ..models.verlet_solver import _first_k_flat
            pos = _first_k_flat(mask_flat, count_hint)
            ok = pos < mask_flat.shape[0]
            sf = jnp.minimum(pos, mask_flat.shape[0] - 1)
            out = [jnp.where(ok, p[sf], fill)
                   for p, fill in zip(planes_flat, (FAR, FAR, 0.0, 0.0))]
            idxp = jnp.where(ok, planes_flat[4][sf], -1)
            return out + [idxp]

        batches = [collect(gone, (pxd.reshape(-1), pyd.reshape(-1),
                                  pvxd.reshape(-1), pvyd.reshape(-1),
                                  pre), K)]
        for dm, src in ((dm1, src1), (dmn, srcn)):
            # src: [5, ny_pad, cap] f32 planes (idx bitcast in plane 4)
            sidxp = jax.lax.bitcast_convert_type(src[4], jnp.int32)
            batches.append(collect(
                dm.reshape(-1),
                (src[0].reshape(-1), src[1].reshape(-1),
                 src[2].reshape(-1), src[3].reshape(-1),
                 sidxp.reshape(-1)), K))

        pool = [jnp.concatenate([old] + [b[i] for b in batches])
                for i, old in enumerate((sx, sy, svx, svy, sidx))]
        keep = jnp.argsort(pool[4] < 0, stable=True)[:K]
        sx, sy, svx, svy, sidx = (p[keep] for p in pool)

        # re-admission: post-merge occupancy, local cells only
        valid = sidx >= 0
        occ_cell = jnp.sum(xd < FAR * 0.5, axis=1).astype(jnp.int32)
        inv = 1.0 / g.cell_size
        gx = jnp.where(valid, sx, ox)
        gy = jnp.where(valid, sy, g.origin_y)
        ccx = jnp.floor((gx - ox) * inv).astype(jnp.int32)
        ccy = jnp.floor((gy - g.origin_y) * inv).astype(jnp.int32)
        elig = (valid & (svx * svx + svy * svy <= vmax2)
                & (ccx >= 0) & (ccx < g.nx) & (ccy >= 0) & (ccy < g.ny))
        row = jnp.clip(ccy, 0, g.ny - 1) + g.row0
        col = jnp.clip(ccx, 0, g.nx - 1) + 1
        base = occ_cell[row, col]
        cid = row * g.nx_pad + col
        io = jnp.arange(K)
        rank = jnp.sum((cid[:, None] == cid[None, :]) & elig[None, :]
                       & (io[None, :] < io[:, None]), axis=1)
        admit = elig & (base + rank < cap)
        slot = jnp.where(admit, base + rank, cap + (1 << 20))
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

    def rebin_d1(xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                 sx, sy, svx, svy, sidx, readmitted, d=None):
        """D=1 rebin: the global bounce box keeps every particle inside the
        (padded) slab, so slab exits are impossible — the default plain-clip
        reslot captures nothing, and the whole ghost-clear/capture/exchange/
        merge pipeline is skipped (it cost ~1.8 ms of full-plane
        materializations per rebin at 1M, 2.9x the flagship's rebin branch,
        for provably-dead work).  Ghost columns are FAR by invariant at D=1
        (init never writes them, the per-step fill is an identity, and the
        plain-clip reslot re-emits them as FAR)."""
        alive_before = count_live(xd)
        pre = (xd, yd, vxd, vyd, idx_d)
        # d=None: inside shard_map.  An explicit d supports the UNWRAPPED
        # D=1 rotated rebin (no shard_map => jit-level donation pairing
        # aliases like the flagship's; axis_index is illegal outside).
        if d is None:
            d = jax.lax.axis_index(AXIS)
        xd, yd, vxd, vyd, idx_d, cnt = reslot(xd, yd, vxd, vyd, idx_d,
                                              origin=origin_of(d))
        matched = jnp.sum(cnt).astype(jnp.int32)
        captured = jnp.sum(jnp.minimum(cnt, cap)).astype(jnp.int32)
        overflow = overflow + (matched - captured)
        lost = lost + (alive_before - matched)
        if n is not None:
            need = (alive_before - captured > 0) | jnp.any(sidx >= 0)
            # dead export/merge-drop inputs: _sh_recover reduces exactly to
            # the single-chip recovery when these never match/select
            zi = jnp.full(xd.shape[:2], -1, jnp.int32)
            zm = jnp.zeros(xd.shape[:2], bool)
            zsrc = jnp.broadcast_to(
                jnp.asarray([FAR, FAR, 0.0, 0.0, FAR],
                            jnp.float32).reshape(5, 1, 1),
                (5,) + xd.shape[:2])
            ops = (xd, yd, vxd, vyd, idx_d, *pre, zi, zi, zm, zsrc, zm,
                   zsrc, origin_of(d)[0], sx, sy, svx, svy, sidx,
                   readmitted)
            (xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy, sidx,
             readmitted) = jax.lax.cond(
                need, _sh_recover,
                lambda op: (op[0], op[1], op[2], op[3], op[4],
                            op[17], op[18], op[19], op[20], op[21], op[22]),
                ops)
        return (xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                sx, sy, svx, svy, sidx, readmitted)

    def collective_rebin(xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                         sx, sy, svx, svy, sidx, readmitted):
        """Local reslot with ghost capture + one ppermute pair + edge-cell
        merge.  Ghost columns arrive holding NEIGHBOUR values (per-step halo
        state); only xd and idx_d need clearing — the reslot gates candidate
        liveness on x alone (ops/reslot.py ``live = x < FAR/2``), so y/vx/vy
        ghost junk is never collected, and idx must be cleared so the
        recovery presence test can't mistake neighbour ids for residents.
        Identity (idx) rides the exchange bitcast to f32 — exact round-trip,
        one ppermute pair still moves everything.

        Ghost columns of x/y/vx/vy are NOT re-cleared after capture
        extraction: the per-step ghost fill overwrites them with neighbour
        values immediately after the rebin cond, before any kernel reads
        them (occ_of's block_kmax3 may transiently count capture junk — a
        harmless superset bound)."""
        # neighbour-valued x-ghosts are the neighbour's real particles —
        # clear so the reslot can't duplicate them locally (x gates
        # liveness, so the other payload ghosts can stay stale)
        xd = clear_ghost_cols(xd, FAR)
        idx_d = clear_ghost_cols(idx_d, -1)
        alive_before = count_live(xd)
        pre = (xd, yd, vxd, vyd, idx_d)     # recovery: pre-reslot snapshot

        d = jax.lax.axis_index(AXIS)
        xd, yd, vxd, vyd, idx_d, cnt = reslot(xd, yd, vxd, vyd, idx_d,
                                              origin=origin_of(d))
        matched = jnp.sum(cnt).astype(jnp.int32)
        captured = jnp.sum(jnp.minimum(cnt, cap)).astype(jnp.int32)
        overflow = overflow + (matched - captured)
        lost = lost + (alive_before - matched)

        idx_f = jax.lax.bitcast_convert_type(idx_d, jnp.float32)
        dead_if = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)

        # exits sit in the ghost columns now: lane 0 = cell -1 (left exit),
        # lane nxl+1 = cell nxl (right exit)
        def col(a, lane):
            return jax.lax.slice_in_dim(a, lane, lane + 1, axis=2)[:, :, 0]
        planes = (xd, yd, vxd, vyd, idx_f)
        ex_l = jnp.stack([col(a, 0) for a in planes])
        ex_r = jnp.stack([col(a, nxl + 1) for a in planes])

        if D > 1:
            # my left exits -> left neighbour; I receive my right
            # neighbour's left exits (they belong in my cell nxl-1, lane nxl)
            in_from_right = jax.lax.ppermute(ex_l, AXIS, sh._bwd_perm(D))
            # my right exits -> right neighbour; I receive my left
            # neighbour's right exits (my cell 0, lane 1)
            in_from_left = jax.lax.ppermute(ex_r, AXIS, sh._fwd_perm(D))
            # unpaired edges receive zeros: mask positions back to FAR
            dead = jnp.stack([jnp.full_like(ex_l[0], FAR),
                              jnp.full_like(ex_l[0], FAR),
                              jnp.zeros_like(ex_l[0]),
                              jnp.zeros_like(ex_l[0]),
                              jnp.full_like(ex_l[0], dead_if)])
            in_from_right = jnp.where(d == D - 1, dead, in_from_right)
            in_from_left = jnp.where(d == 0, dead, in_from_left)
        else:  # pragma: no cover — D=1 takes rebin_d1
            in_from_right = in_from_left = None

        # edge devices fold their own outward captures back into the edge
        # cell (the bounce box clamps x, so these are boundary-exact
        # positions, not real exits)
        if D > 1:
            src_lane1 = jnp.where(d == 0, ex_l, in_from_left)
            src_lane_nxl = jnp.where(d == D - 1, ex_r, in_from_right)
        else:  # pragma: no cover — D=1 takes rebin_d1
            src_lane1, src_lane_nxl = ex_l, ex_r

        fields = [xd, yd, vxd, vyd, idx_f]
        fields, dm1 = merge_col(fields, 1, src_lane1, cnt[:, 1])
        fields, dmn = merge_col(fields, nxl, src_lane_nxl, cnt[:, nxl])
        xd, yd, vxd, vyd, idx_f = fields
        idx_d = clear_ghost_cols(
            jax.lax.bitcast_convert_type(idx_f, jnp.int32), -1)
        drop_now = (jnp.sum(dm1) + jnp.sum(dmn)).astype(jnp.int32)
        dropped = dropped + drop_now

        if n is not None:
            # per-device recovery (local; predicate may diverge across
            # devices — no collectives inside the branch)
            need = ((alive_before - captured > 0) | (drop_now > 0)
                    | jnp.any(sidx >= 0))
            exi_l = jax.lax.bitcast_convert_type(ex_l[4], jnp.int32)
            exi_r = jax.lax.bitcast_convert_type(ex_r[4], jnp.int32)
            ops = (xd, yd, vxd, vyd, idx_d, *pre,
                   exi_l, exi_r, dm1, src_lane1, dmn, src_lane_nxl,
                   origin_of(d)[0],
                   sx, sy, svx, svy, sidx, readmitted)
            (xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy, sidx,
             readmitted) = jax.lax.cond(
                need, _sh_recover,
                lambda op: (op[0], op[1], op[2], op[3], op[4],
                            op[17], op[18], op[19], op[20], op[21], op[22]),
                ops)
        return (xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                sx, sy, svx, svy, sidx, readmitted)

    def local_init(x, y, vx, vy, idx, alive, step):
        x, y, vx, vy, idx, alive = (a.reshape(a.shape[1:])
                                    for a in (x, y, vx, vy, idx, alive))
        b, xd, yd, vxd, vyd, idxd = bin_local(x, y, vx, vy, idx, alive)
        # spill-collect the init sort's capacity drops (same as the
        # single-chip init_dense) so rebins can re-admit them; dormant
        # (empty) when recovery is off (n=None)
        K = spill_cap
        m = x.shape[0]
        over = alive & (b.rank >= cap) if n is not None \
            else jnp.zeros_like(alive)
        dpos = jnp.nonzero(over, size=K, fill_value=m)[0]
        dv = dpos < m
        ds = jnp.minimum(dpos, m - 1)
        r1 = lambda a: a.reshape((1,) + a.shape)
        z = jnp.zeros_like(xd)
        return tuple(map(r1, (
            xd, yd, vxd, vyd, z, xd, yd, idxd, occ_of(xd),
            jnp.float32(0.0), count_live(xd),
            jnp.int32(0), b.overflow, jnp.int32(0), jnp.int32(0),
            jnp.int32(1),
            jnp.where(dv, x[ds], FAR), jnp.where(dv, y[ds], FAR),
            jnp.where(dv, vx[ds], 0.0), jnp.where(dv, vy[ds], 0.0),
            jnp.where(dv, idx[ds], -1), jnp.int32(0))))

    def local_init_chunked(x, y, vx, vy, idx, alive, step):
        """``local_init`` with O(m / init_chunks) sort transients per
        device: scans verlet_solver's chunk-init body over slices of the
        local particle buffer (the stable within-chunk rank + running
        cell counts reproduce the sort-based slot assignment EXACTLY, so
        the dense result is bitwise local_init's — same guarantee as
        Session(init_chunks=K), tests/test_shard_verlet.py)."""
        from ..models import verlet_solver as vs
        x, y, vx, vy, idx, alive = (a.reshape(a.shape[1:])
                                    for a in (x, y, vx, vy, idx, alive))
        d = jax.lax.axis_index(AXIS)
        m = x.shape[0]
        K = init_chunks
        c = -(-m // K)
        pad = K * c - m

        def padf(a, fill):
            if pad == 0:
                return a
            return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

        # dead buffer entries: idx -> -1 is the body's validity test
        chunks = (padf(jnp.where(alive, x, FAR), FAR).reshape(K, c),
                  padf(jnp.where(alive, y, FAR), FAR).reshape(K, c),
                  padf(jnp.where(alive, vx, 0.0), 0.0).reshape(K, c),
                  padf(jnp.where(alive, vy, 0.0), 0.0).reshape(K, c),
                  padf(jnp.where(alive, idx, -1), -1).reshape(K, c))
        body = vs._chunk_init_body(g, spill_cap, n is not None,
                                   origin=origin_of(d))
        out, _ = jax.lax.scan(body, vs._chunk_init_carry(g, spill_cap),
                              chunks)
        (xd, yd, vxd, vyd, idx_d, _cnt, overflow,
         sx, sy, svx, svy, sidx) = out
        r1 = lambda a: a.reshape((1,) + a.shape)
        return tuple(map(r1, (
            xd, yd, vxd, vyd, jnp.zeros_like(xd), xd, yd, idx_d,
            occ_of(xd), jnp.float32(0.0), count_live(xd),
            jnp.int32(0), overflow, jnp.int32(0), jnp.int32(0),
            jnp.int32(1), sx, sy, svx, svy, sidx, jnp.int32(0))))

    def local_init_gen(step):
        """Generator init (see the factory docstring): each device scans
        the GLOBAL index range in chunks, keeps the particles whose slab
        is its own, and runs them through the shared chunk-init body with
        its slab origin.  The stable-rank + running-count machinery makes
        the dense result independent of chunk boundaries, so this is
        bitwise local_init_chunked's output for the same scene (slab
        compaction preserves original particle order; gated by
        tests/test_sharded_session.py)."""
        from ..models import verlet_solver as vs
        d = jax.lax.axis_index(AXIS)
        K = init_chunks or 16
        c = -(-gen_n // K)
        body = vs._chunk_init_body(g, spill_cap, n is not None,
                                   origin=origin_of(d))

        def gen_body(carry, k):
            gi = k * c + jnp.arange(c, dtype=jnp.int32)
            valid = gi < gen_n
            x, y, vx, vy = gen(gi)
            # slab membership: shard_state's float32 floor-divide, exactly
            slab = jnp.clip(
                jnp.floor((x - spec.global_x0) / spec.slab_width)
                .astype(jnp.int32), 0, D - 1)
            mine = valid & (slab == d)
            chunk = (jnp.where(mine, x, FAR), jnp.where(mine, y, FAR),
                     jnp.where(mine, vx, 0.0), jnp.where(mine, vy, 0.0),
                     jnp.where(mine, gi, -1))
            return body(carry, chunk)

        out, _ = jax.lax.scan(gen_body, vs._chunk_init_carry(g, spill_cap),
                              jnp.arange(K, dtype=jnp.int32))
        (xd, yd, vxd, vyd, idx_d, _cnt, overflow,
         sx, sy, svx, svy, sidx) = out
        r1 = lambda a: a.reshape((1,) + a.shape)
        return tuple(map(r1, (
            xd, yd, vxd, vyd, jnp.zeros_like(xd), xd, yd, idx_d,
            occ_of(xd), jnp.float32(0.0), count_live(xd),
            jnp.int32(0), overflow, jnp.int32(0), jnp.int32(0),
            jnp.int32(1), sx, sy, svx, svy, sidx, jnp.int32(0))))

    def local_rebin(xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                    sx, sy, svx, svy, sidx, readmitted):
        """Per-device rebin body, invoked from step_fn's JIT-LEVEL cond.
        Refreshes occ (slot-loop bounds) and the per-slab live count along
        with the rebinned planes; ref planes are re-aimed at the new xd/yd
        by the caller (an alias, not a copy, at the jit level)."""
        sq = lambda a: a.reshape(a.shape[1:])
        (xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
         sx, sy, svx, svy, sidx, readmitted) = map(
            sq, (xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
                 sx, sy, svx, svy, sidx, readmitted))
        rebin_fn = collective_rebin if D > 1 else rebin_d1
        (xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
         sx, sy, svx, svy, sidx, readmitted) = rebin_fn(
            xd, yd, vxd, vyd, idx_d, overflow, lost, dropped,
            sx, sy, svx, svy, sidx, readmitted)
        real = lambda a: jax.lax.slice_in_dim(a, 1, nxl + 1, axis=2)
        r1 = lambda a: a.reshape((1,) + a.shape)
        return tuple(map(r1, (xd, yd, vxd, vyd, idx_d, occ_of(xd),
                              overflow, lost, dropped,
                              sx, sy, svx, svy, sidx, readmitted,
                              count_live(real(xd)))))

    def local_purestep(xd, yd, vxd, vyd, ref_xd, ref_yd, occ):
        """The between-rebins step: ghost fill + density + forces/integrate.
        idx/occ/spill/counters don't flow through — they're untouched here
        and stay aliased in the scan carry at the jit level.  Refless:
        ref_xd/ref_yd are [1,1,1] placeholders; disp2 returns THIS step's
        max displacement (the jit level accumulates the bound)."""
        sq = lambda a: a.reshape(a.shape[1:])
        xd, yd, vxd, vyd, ref_xd, ref_yd, occ = map(
            sq, (xd, yd, vxd, vyd, ref_xd, ref_yd, occ))
        real = lambda a: jax.lax.slice_in_dim(a, 1, nxl + 1, axis=2)

        # per-step halo: current neighbour edge values into ghost columns
        # (ONE ppermute pair for all four planes — per-step ICI is now two
        # collective launches: this one + the post-density rho exchange)
        xd, yd, vxd, vyd = sh._fill_ghost_cols_multi(
            (xd, yd, vxd, vyd), nxl, D, (FAR, FAR, 0.0, 0.0))
        xd0, yd0 = xd, yd               # refless: this step's baseline

        rho_d = density_fn(xd, yd, params, occ=occ)
        rho_d = sh._fill_ghost_cols(rho_d, nxl, D, 0.0)

        if forces_fn is None:
            # fused hardware path: forces + integrate + bounce + the next
            # step's trigger scalar in one kernel; ghost lanes excluded
            # from the displacement max (their reference is FAR — and in
            # refless mode they are neighbour copies the owner counts)
            xd, yd, vxd, vyd, disp2 = pallas_solver.forces_integrate_pallas(
                xd, yd, vxd, vyd, rho_d,
                xd0 if refless else ref_xd, yd0 if refless else ref_yd,
                params, cfg, g, interpret=interpret, occ=occ,
                disp_lanes=(1, nxl + 1), refless=refless)
        else:
            ax_d, ay_d = forces_fn(xd, yd, vxd, vyd, rho_d, params, occ=occ)
            ay_d = ay_d + GRAVITY_Y

            live = xd < FAR * 0.5
            vx = vxd + ax_d * cfg.dt
            vy = vyd + ay_d * cfg.dt
            x = xd + vx * cfg.dt
            y = yd + vy * cfg.dt
            below = y < cfg.floor_y
            y = jnp.where(below, cfg.floor_y, y)
            vy = jnp.where(below, vy * cfg.bounce, vy)
            right = x > cfg.x_max
            x = jnp.where(right, cfg.x_max, x)
            vx = jnp.where(right, vx * cfg.bounce, vx)
            left = x < cfg.x_min
            x = jnp.where(left, cfg.x_min, x)
            vx = jnp.where(left, vx * cfg.bounce, vx)

            xd = jnp.where(live, x, xd)
            yd = jnp.where(live, y, yd)
            vxd = jnp.where(live, vx, 0.0)
            vyd = jnp.where(live, vy, 0.0)
            if refless:
                ddx = real(xd) - real(xd0)   # this step's move
                ddy = real(yd) - real(yd0)
            else:
                ddx = real(xd) - real(ref_xd)
                ddy = real(yd) - real(ref_yd)
            disp2 = jnp.max(ddx * ddx + ddy * ddy)

        r1 = lambda a: a.reshape((1,) + a.shape)
        return tuple(map(r1, (xd, yd, vxd, vyd, rho_d, disp2)))

    dense_specs = (P(AXIS),) * 22
    if gen is not None:
        init_sharded = jax.shard_map(
            local_init_gen, mesh=mesh, in_specs=(P(),),
            out_specs=dense_specs, check_vma=False)
    else:
        init_sharded = jax.shard_map(
            local_init if init_chunks is None else local_init_chunked,
            mesh=mesh,
            in_specs=(P(AXIS),) * 6 + (P(),),
            out_specs=dense_specs, check_vma=False)
    rebin_sharded = jax.shard_map(
        local_rebin, mesh=mesh,
        in_specs=(P(AXIS),) * 14,
        out_specs=(P(AXIS),) * 16, check_vma=False)
    purestep_sharded = jax.shard_map(
        local_purestep, mesh=mesh,
        in_specs=(P(AXIS),) * 7,
        out_specs=(P(AXIS),) * 6, check_vma=False)

    def _pack(out, step):
        (xd, yd, vxd, vyd, rho_d, rxd, ryd, idxd, occ, dsp, alive, age,
         ovf, lost, drp, rbc, sx, sy, svx, svy, sidx, readm) = out
        return ShardedDenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                               ref_xd=rxd, ref_yd=ryd, idx_d=idxd, occ=occ,
                               disp2=dsp, alive=alive, age=age,
                               overflow=ovf, lost=lost, dropped=drp,
                               rebin_count=rbc, step=step,
                               sx=sx, sy=sy, svx=svx, svy=svy, sidx=sidx,
                               readmitted=readm)

    def _ref_none():
        """[D, 1, 1, 1] stand-ins for the per-device ref planes in the
        refless posture (shape-stable carry; 2 plane-footprints freed)."""
        return jnp.zeros((D, 1, 1, 1), jnp.float32)

    @jax.jit
    def init_fn(s) -> ShardedDenseSim:
        # gen path: ``s`` is the (replicated) initial step scalar;
        # state path: ``s`` is a ShardedState of [D, capacity] buffers.
        if gen is not None:
            sim = _pack(init_sharded(s), s)
        else:
            sim = _pack(init_sharded(s.x, s.y, s.vx, s.vy, s.idx, s.alive,
                                     s.step), s.step)
        if refless:
            sim = dataclasses.replace(sim, ref_xd=_ref_none(),
                                      ref_yd=_ref_none())
        return sim

    def _need_of(sim: ShardedDenseSim):
        # Collective rebin trigger, evaluated OUTSIDE shard_map on the tiny
        # [D] per-device disp2/age vectors (any device over skin -> all
        # rebin; XLA inserts the scalar all-reduce itself, and at D=1 it's
        # free).
        thr = skin_half if refless else skin_half * skin_half
        return jnp.any((sim.disp2 > thr) | (sim.age >= max_age))

    def _do_rebin(s: ShardedDenseSim) -> ShardedDenseSim:
        (xd, yd, vxd, vyd, idx_d, occ, ovf, lost, drp,
         sx, sy, svx, svy, sidx, readm, alive) = rebin_sharded(
            s.xd, s.yd, s.vxd, s.vyd, s.idx_d, s.overflow, s.lost,
            s.dropped, s.sx, s.sy, s.svx, s.svy, s.sidx, s.readmitted)
        return dataclasses.replace(
            s, xd=xd, yd=yd, vxd=vxd, vyd=vyd, idx_d=idx_d, occ=occ,
            ref_xd=_ref_none() if refless else xd,
            ref_yd=_ref_none() if refless else yd, alive=alive,
            age=jnp.zeros_like(s.age),
            # refless: the accumulated bound restarts at a rebin
            # (ref-based keeps the passthrough — purestep overwrites)
            disp2=jnp.zeros_like(s.disp2) if refless else s.disp2,
            overflow=ovf, lost=lost,
            dropped=drp, rebin_count=s.rebin_count + 1,
            sx=sx, sy=sy, svx=svx, svy=svy, sidx=sidx,
            readmitted=readm)

    def _pure(sim: ShardedDenseSim) -> ShardedDenseSim:
        xd, yd, vxd, vyd, rho_d, disp2 = purestep_sharded(
            sim.xd, sim.yd, sim.vxd, sim.vyd, sim.ref_xd, sim.ref_yd,
            sim.occ)
        if refless:
            disp2 = sim.disp2 + jnp.sqrt(disp2)
        return dataclasses.replace(
            sim, xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d, disp2=disp2,
            age=sim.age + 1, step=sim.step + 1)

    @jax.jit
    def step_fn(sim: ShardedDenseSim) -> ShardedDenseSim:
        # The cond sits at the JIT level over the scan carry — the
        # flagship-equivalent structure whose untaken branch ALIASES the
        # carry.  The previous design conded per-device INSIDE shard_map,
        # and the identity branch copied all 20 plane operands in and out
        # on every no-rebin step: ~0.3 ms/step at 1M, the entire sharded-
        # vs-flagship D=1 base gap isolated by tools/exp_shard_gap.py
        # (BASELINE.json round4_sharded_glue).
        sim = jax.lax.cond(_need_of(sim), _do_rebin, lambda s: s, sim)
        return _pure(sim)

    def make_segmented(donate: bool = True):
        """The sharded HBM-ceiling run driver pieces, the twin of
        Session._segmented_build: ``step_until`` runs pure steps in a
        while_loop with NO rebin cond in the program (no cond temp
        planes), ``rebin_one`` is the rebin as its own donated dispatch.
        With ``refless`` the rebin is ROTATED (planes positional, rho
        first): jax's greedy donation pairing lands each apply output in
        the previous plane's dead buffer instead of self-pairing, which
        a halo-DMA kernel can only satisfy with full-plane input copies.
        Returns (step_until, rebin_one, rotated); trajectories are
        BITWISE step_fn's (same pre-step trigger check)."""
        dn = (0,) if donate else ()

        @partial(jax.jit, donate_argnums=dn)
        def step_until(sim, k):
            def go(c):
                s, i = c
                return jnp.logical_and(~_need_of(s), i < k)

            def body(c):
                s, i = c
                return _pure(s), i + 1

            sim, i = jax.lax.while_loop(go, body, (sim, jnp.int32(0)))
            return sim, i, _need_of(sim)

        rotated = bool(donate and refless)
        if rotated:
            # idx is donated TOO and the new idx returns as an f32
            # BITCAST: greedy pairing then lands it in vyd's dead buffer
            # (the 5th f32 plane in the deque) while the s32 idx input
            # becomes xla-donated arena — without this the rebin carries
            # a full non-donated idx plane, which was the 160M/device
            # runtime RESOURCE_EXHAUSTED after everything else was shed.
            # The driver bitcasts back in its own dispatch once the rebin
            # has drained (a transient plane copy against an empty arena).
            if D == 1:
                # UNWRAPPED D=1 rebin under plain jit — AND the
                # flagship's CODE-BASED planar pipeline instead of
                # rebin_d1: rebin_d1's recovery cond captures all five
                # PRE-reslot planes (the presence-diff collect), holding
                # them live across the applies so the donation rotation
                # cannot overwrite them (the 160M/device runtime OOM
                # after every other plane was shed; an unwrapped
                # rebin_d1 measurably refuted the shard_map-alias
                # hypothesis first).  The code-based collect reads only
                # (code, idx): old planes die at their own apply, K-sized
                # value gathers run outside the cond — the structure the
                # flagship runs clean at 224M.  At D=1 the export
                # machinery is dead and the slab origin equals the grid
                # origin, so verlet_solver's own helpers drop in; the
                # bitwise D=1 gate pins it against the shard_map'd path.
                from ..models.verlet_solver import (_first_k_flat,
                                                   _spill_admit,
                                                   _spill_merge)
                _interp = reslot_ops._interpret_default() \
                    if interpret is None else interpret
                vmax2 = (skin_half / cfg.dt) ** 2

                def _rebin_body(s):
                    sq = lambda a: a.reshape(a.shape[1:])
                    xd, yd, vxd, vyd, idx_d = (sq(s.xd), sq(s.yd),
                                               sq(s.vxd), sq(s.vyd),
                                               sq(s.idx_d))
                    occ = sq(s.occ)
                    (ovf, lost, drp, sx, sy, svx, svy, sidx, readm) = (
                        sq(s.overflow), sq(s.lost), sq(s.dropped),
                        sq(s.sx), sq(s.sy), sq(s.svx), sq(s.svy),
                        sq(s.sidx), sq(s.readmitted))
                    alive_before = count_live(xd)
                    code, cnt = reslot_ops.select_pallas(
                        xd, yd, g, interpret=_interp, occ=occ)
                    matched = jnp.sum(cnt).astype(jnp.int32)
                    captured = jnp.sum(jnp.minimum(cnt, cap)).astype(
                        jnp.int32)
                    if n is not None:
                        K = sx.shape[0]
                        total = idx_d.size
                        need = ((alive_before - captured > 0)
                                | jnp.any(sidx >= 0))

                        def find_drops(ops):
                            code_, pidx_d = ops
                            taken = reslot_ops.taken_mask(code_, cap)
                            dropped_m = ((pidx_d.reshape(-1) >= 0)
                                         & ~taken.reshape(-1))
                            return _first_k_flat(dropped_m, K)

                        dpos = jax.lax.cond(
                            need, find_drops,
                            lambda op: jnp.full((K,), total, jnp.int32),
                            (code, idx_d))
                        dv = dpos < total
                        dsf = jnp.minimum(dpos, total - 1)
                        _, CAP_, C_ = xd.shape
                        dr = dsf // (CAP_ * C_)
                        drem = dsf - dr * (CAP_ * C_)
                        dk = drem // C_
                        dc = drem - dk * C_
                        drops = (jnp.where(dv, xd[dr, dk, dc], FAR),
                                 jnp.where(dv, yd[dr, dk, dc], FAR),
                                 jnp.where(dv, vxd[dr, dk, dc], 0.0),
                                 jnp.where(dv, vyd[dr, dk, dc], 0.0),
                                 jnp.where(dv, idx_d[dr, dk, dc], -1))
                        sx, sy, svx, svy, sidx = jax.lax.cond(
                            need,
                            lambda op: _spill_merge(op[0], op[1]),
                            lambda op: op[0],
                            ((sx, sy, svx, svy, sidx), drops))

                    ap = reslot_ops.apply_code_pallas
                    xd = ap(xd, code, occ, g, FAR, _interp)
                    yd = ap(yd, code, occ, g, FAR, _interp)
                    vxd = ap(vxd, code, occ, g, 0.0, _interp)
                    vyd = ap(vyd, code, occ, g, 0.0, _interp)
                    idx_d = ap(idx_d, code, occ, g, -1, _interp)

                    if n is not None:
                        (xd, yd, vxd, vyd, idx_d, sx, sy, svx, svy,
                         sidx, readm) = jax.lax.cond(
                            need,
                            lambda op: _spill_admit(*op, grid=g,
                                                    vmax2=vmax2),
                            lambda op: (op[0], op[1], op[2], op[3],
                                        op[4], op[6], op[7], op[8],
                                        op[9], op[10], op[11]),
                            (xd, yd, vxd, vyd, idx_d, cnt,
                             sx, sy, svx, svy, sidx, readm))

                    real = lambda a: jax.lax.slice_in_dim(a, 1, nxl + 1,
                                                          axis=2)
                    r1 = lambda a: a.reshape((1,) + a.shape)
                    return dataclasses.replace(
                        s, xd=r1(xd), yd=r1(yd), vxd=r1(vxd), vyd=r1(vyd),
                        idx_d=r1(idx_d), occ=r1(occ_of(xd)),
                        ref_xd=_ref_none(), ref_yd=_ref_none(),
                        alive=r1(count_live(real(xd))),
                        age=jnp.zeros_like(s.age),
                        disp2=jnp.zeros_like(s.disp2),
                        overflow=r1(ovf + (matched - captured)),
                        lost=r1(lost + (alive_before - matched)),
                        dropped=r1(drp),
                        rebin_count=s.rebin_count + 1,
                        sx=r1(sx), sy=r1(sy), svx=r1(svx), svy=r1(svy),
                        sidx=r1(sidx), readmitted=r1(readm))
            else:
                _rebin_body = _do_rebin

            @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
            def rebin_one(rho_d, xd, yd, vxd, vyd, idx_d, rest):
                (occ, disp2, alive, age, overflow, lost, dropped,
                 rebin_count, step, sx, sy, svx, svy, sidx,
                 readmitted) = rest
                sim = ShardedDenseSim(
                    xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                    ref_xd=_ref_none(), ref_yd=_ref_none(), idx_d=idx_d,
                    occ=occ, disp2=disp2, alive=alive, age=age,
                    overflow=overflow, lost=lost, dropped=dropped,
                    rebin_count=rebin_count, step=step, sx=sx, sy=sy,
                    svx=svx, svy=svy, sidx=sidx, readmitted=readmitted)
                out = _rebin_body(sim)
                # rho's buffer now holds the new xd (pairing rotation);
                # the driver re-attaches a fresh zero plane
                return dataclasses.replace(
                    out, rho_d=_ref_none(),
                    idx_d=jax.lax.bitcast_convert_type(out.idx_d,
                                                       jnp.float32))
        else:
            @partial(jax.jit, donate_argnums=dn)
            def rebin_one(sim):
                return _do_rebin(sim)

        return step_until, rebin_one, rotated

    return _StepFns(init_fn, step_fn, make_segmented)


class _StepFns:
    """(init_fn, step_fn) with the segmented-driver factory riding along:
    unpacks as the historical 2-tuple (``init_fn, step_fn = ...``) so the
    twenty-odd existing call sites are untouched; ShardedSession reaches
    ``.make_segmented`` for the HBM-ceiling driver."""

    def __init__(self, init_fn, step_fn, make_segmented):
        self.init_fn = init_fn
        self.step_fn = step_fn
        self.make_segmented = make_segmented

    def __iter__(self):
        return iter((self.init_fn, self.step_fn))


def extract_state(sim: ShardedDenseSim, spec: sh.ShardSpec,
                  params: FluidParams) -> sh.ShardedState:
    """Per-particle view for rendering/analysis (off the hot path): live
    dense slots compacted into per-device [capacity] buffers, vmapped over
    the device axis, with each particle's tracked original index in
    ``idx``.  Suspended (spill) particles ride along at their frozen
    positions with analytic self-density."""
    g = spec.local_grid
    M = spec.capacity
    self_rho = self_density(params)

    def per_device(xd, yd, vxd, vyd, rho_d, idx_d, sx, sy, svx, svy, sidx):
        def real(a):
            return jax.lax.slice(
                a, (g.row0, 0, 1),
                (g.row0 + g.ny, g.cap, 1 + g.nx)).reshape(-1)

        x = jnp.concatenate([real(xd), sx])
        R = x.shape[0]
        slot = jnp.flatnonzero(x < FAR * 0.5, size=M, fill_value=R)
        ok = slot < R
        safe = jnp.minimum(slot, R - 1)

        def take(a, s, fill):
            return jnp.where(ok, jnp.concatenate([real(a), s])[safe], fill)
        srho = jnp.full_like(sx, self_rho)
        return (take(xd, sx, FAR), take(yd, sy, FAR), take(vxd, svx, 0.0),
                take(vyd, svy, 0.0), take(rho_d, srho, 0.0),
                take(idx_d, sidx, -1), ok)

    x, y, vx, vy, rho, idx, ok = jax.vmap(per_device)(
        sim.xd, sim.yd, sim.vxd, sim.vyd, sim.rho_d, sim.idx_d,
        sim.sx, sim.sy, sim.svx, sim.svy, sim.sidx)
    return sh.ShardedState(
        x=x, y=y, vx=vx, vy=vy, rho=rho,
        p=jnp.where(ok, eos_pressure(rho, params), 0.0),
        idx=idx, alive=ok, step=sim.step)


def extract_fluid_state(sim: ShardedDenseSim, spec: sh.ShardSpec,
                        params: FluidParams, n: int) -> FluidState:
    """ORIGINAL-order per-particle FluidState from the sharded dense state
    (off the hot path): one stacked dense->[N] scatter keyed by the tracked
    idx plane — the same contract as the single-chip
    ``verlet_solver.extract_fields``, so multi-chip runs support the
    reference-style particle-i-to-particle-i parity gates
    (reference: examples/gpu_parity10.rs:104-139) and original-order
    checkpoint/resume.  Particles dropped to capacity/migration limits come
    back as FAR positions, zero velocity, analytic self-density."""
    g = spec.local_grid

    def real(a):
        # [D, ny, cap, nx] real slots of every device, flattened together
        return jax.lax.slice(
            a, (0, g.row0, 0, 1),
            (a.shape[0], g.row0 + g.ny, g.cap, 1 + g.nx)).reshape(-1)

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
    # never appears in any device's dense planes)
    sflat = sim.sidx.reshape(-1)
    ssafe = jnp.where(sflat >= 0, sflat, n + (1 << 20))
    svals = jnp.stack([sim.sx.reshape(-1), sim.sy.reshape(-1),
                       sim.svx.reshape(-1), sim.svy.reshape(-1),
                       jnp.full_like(sim.sx.reshape(-1), self_rho)],
                      axis=-1)
    out = out.at[ssafe].set(svals, mode="drop")
    rho = out[:, 4]
    z = jnp.zeros((n,), jnp.float32)
    return FluidState(x=out[:, 0], y=out[:, 1], vx=out[:, 2], vy=out[:, 3],
                      ax=z, ay=z, rho=rho, p=eos_pressure(rho, params),
                      step=sim.step)
