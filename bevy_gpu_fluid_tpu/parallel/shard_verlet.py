"""Multi-chip verlet: deferred rebinning on spatially-decomposed slabs.

Combines the two fastest designs in the framework:

* the slab decomposition of ``parallel/shard.py`` (one x-slab per device,
  nearest-neighbour ``ppermute`` halos), and
* the deferred-rebinning scheme of ``models/verlet_solver.py`` (state stays
  dense between rebins; slot assignment frozen under a Verlet skin).

Key observation: the two compose cleanly.  Between rebins, only the VALUES in
the neighbour's edge column change, not the slot structure — so per-step ICI
traffic is five ghost-column exchanges of [ny_pad, cap, 1] (a few hundred KB),
and the expensive sort/scatter machinery plus particle migration run only at
rebins.  A particle that physically crosses the slab boundary mid-interval
stays in its frozen (near-edge) slots and keeps interacting correctly through
the halo until the next rebin — the same skin bound that keeps the 3x3 window
a superset of every r < h neighbourhood also bounds how far it can stray.

Rebinning must be COLLECTIVE (migration is an exchange), so the per-device
skin trigger is psum-reduced and all devices take the rebin branch together.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.params import FluidParams, IntegrateConfig, GRAVITY_Y
from ..ops.binning import FAR, bin_particles, to_dense, gather_slots
from ..ops.kernels import eos_pressure
from ..models import grid_solver, pallas_solver
from . import shard as sh

AXIS = sh.AXIS


@partial(jax.tree_util.register_dataclass,
         data_fields=("xd", "yd", "vxd", "vyd", "rho_d", "ref_xd", "ref_yd",
                      "cx", "cy", "rank", "alive", "age", "overflow",
                      "dropped", "rebin_count", "step"),
         meta_fields=())
@dataclasses.dataclass
class ShardedDenseSim:
    """Per-device dense state, all leaves with a leading [n_devices] axis
    (sharded on it): dense fields [D, ny_pad, cap, nxl_pad], slot coords +
    alive [D, capacity], scalars [D] (step: global scalar)."""

    xd: jax.Array
    yd: jax.Array
    vxd: jax.Array
    vyd: jax.Array
    rho_d: jax.Array
    ref_xd: jax.Array
    ref_yd: jax.Array
    cx: jax.Array
    cy: jax.Array
    rank: jax.Array
    alive: jax.Array
    age: jax.Array
    overflow: jax.Array
    dropped: jax.Array
    rebin_count: jax.Array
    step: jax.Array


def make_sharded_verlet_step(params: FluidParams, cfg: IntegrateConfig,
                             spec: sh.ShardSpec, mesh: Mesh, stencils=None,
                             max_age: int = 64):
    """Returns (init_fn, step_fn):
    init_fn(ShardedState) -> ShardedDenseSim (jitted)
    step_fn(ShardedDenseSim) -> ShardedDenseSim (jitted)

    Requires spec.local_grid.cell_size > params.h (build the spec with
    ``h * skin_factor``)."""
    g = spec.local_grid
    D, M, E = spec.n_devices, spec.capacity, spec.mig_cap
    nxl = spec.nx_local
    if stencils is None:
        stencils = grid_solver.XLA_STENCILS
    density_fn, forces_fn = stencils
    skin_half = (g.cell_size - params.h) * 0.5

    def origin_of(d):
        return (spec.global_x0 + d.astype(jnp.float32) * spec.slab_width,
                g.origin_y)

    def bin_local(x, y, vx, vy, alive):
        d = jax.lax.axis_index(AXIS)
        xb = jnp.where(alive, x, FAR)
        yb = jnp.where(alive, y, FAR)
        b = bin_particles(xb, yb, g, alive=alive, origin=origin_of(d),
                          with_csr=False)
        xd = to_dense(b, xb, fill=FAR)
        yd = to_dense(b, yb, fill=FAR)
        vxd = to_dense(b, jnp.where(alive, vx, 0.0), fill=0.0)
        vyd = to_dense(b, jnp.where(alive, vy, 0.0), fill=0.0)
        return b, xd, yd, vxd, vyd

    def migrate(x, y, vx, vy, alive, dropped):
        """Hand off-slab particles to neighbours (reuses shard.py's packing
        protocol); returns the merged local set."""
        d = jax.lax.axis_index(AXIS)
        slab_lo, _ = origin_of(d)
        slab_hi = slab_lo + spec.slab_width
        go_left = alive & (x < slab_lo) & (d > 0)
        go_right = alive & (x >= slab_hi) & (d < D - 1)
        stay = alive & ~go_left & ~go_right
        if D == 1:
            return x, y, vx, vy, stay, dropped

        fields = lambda: [(x, FAR), (y, FAR), (vx, 0.0), (vy, 0.0)]
        pl_, okl, dl = sh._pack_migrants(fields(), go_left, E)
        pr_, okr, dr = sh._pack_migrants(fields(), go_right, E)
        dropped = dropped + dl + dr

        send_r = jnp.stack(pr_ + [okr.astype(jnp.float32)])
        send_l = jnp.stack(pl_ + [okl.astype(jnp.float32)])
        recv_l = jax.lax.ppermute(send_r, AXIS, sh._fwd_perm(D))
        recv_r = jax.lax.ppermute(send_l, AXIS, sh._bwd_perm(D))

        def unpack(buf):
            ok = buf[4] > 0.5
            return [jnp.where(ok, buf[i], FAR if i < 2 else 0.0)
                    for i in range(4)], ok

        (inl, okl_in), (inr, okr_in) = unpack(recv_l), unpack(recv_r)
        all_alive = jnp.concatenate([stay, okl_in, okr_in])
        cat = lambda f, a, b: jnp.concatenate([f, a, b])
        allx = cat(jnp.where(stay, x, FAR), inl[0], inr[0])
        ally = cat(jnp.where(stay, y, FAR), inl[1], inr[1])
        allvx = cat(jnp.where(stay, vx, 0.0), inl[2], inr[2])
        allvy = cat(jnp.where(stay, vy, 0.0), inl[3], inr[3])
        order = jnp.argsort(~all_alive)[:M]
        new_alive = all_alive[order]
        dropped = dropped + jnp.sum(all_alive) - jnp.sum(new_alive)
        return (allx[order], ally[order], allvx[order], allvy[order],
                new_alive, dropped)

    def local_init(x, y, vx, vy, alive, step):
        x, y, vx, vy, alive = (a.reshape(a.shape[1:])
                               for a in (x, y, vx, vy, alive))
        b, xd, yd, vxd, vyd = bin_local(x, y, vx, vy, alive)
        r1 = lambda a: a.reshape((1,) + a.shape)
        z = jnp.zeros_like(xd)
        return tuple(map(r1, (xd, yd, vxd, vyd, z, xd, yd,
                              b.cx, b.cy, b.rank, alive,
                              jnp.int32(0), b.overflow, jnp.int32(0),
                              jnp.int32(1))))

    def local_step(xd, yd, vxd, vyd, rho_d, ref_xd, ref_yd, cx, cy, rank,
                   alive, age, overflow, dropped, rebins, step):
        sq = lambda a: a.reshape(a.shape[1:])
        (xd, yd, vxd, vyd, rho_d, ref_xd, ref_yd, cx, cy, rank, alive, age,
         overflow, dropped, rebins) = map(
            sq, (xd, yd, vxd, vyd, rho_d, ref_xd, ref_yd, cx, cy, rank,
                 alive, age, overflow, dropped, rebins))

        # collective rebin trigger: real columns only (ghosts are refreshed
        # from neighbours each step and carry no displacement meaning)
        real = lambda a: jax.lax.slice_in_dim(a, 1, nxl + 1, axis=2)
        ddx = real(xd) - real(ref_xd)
        ddy = real(yd) - real(ref_yd)
        disp2 = jnp.max(ddx * ddx + ddy * ddy)
        need = (disp2 > skin_half * skin_half) | (age >= max_age)
        need = jax.lax.psum(need.astype(jnp.int32), AXIS) > 0  # uniform

        def do_rebin(op):
            (xd, yd, vxd, vyd, cx, cy, rank, alive, age, overflow, dropped,
             rebins) = op
            x, y, vx, vy = gather_slots(
                g, cx, cy, rank, [xd, yd, vxd, vyd], [FAR, FAR, 0.0, 0.0])
            alive2 = alive & (x < FAR * 0.5)
            x, y, vx, vy, alive2, dropped = migrate(x, y, vx, vy, alive2,
                                                    dropped)
            b, xd2, yd2, vxd2, vyd2 = bin_local(x, y, vx, vy, alive2)
            return (xd2, yd2, vxd2, vyd2, b.cx, b.cy, b.rank, alive2,
                    jnp.int32(0), jnp.maximum(overflow, b.overflow),
                    dropped.astype(jnp.int32), rebins + 1)

        def no_rebin(op):
            (xd, yd, vxd, vyd, cx, cy, rank, alive, age, overflow, dropped,
             rebins) = op
            return (xd, yd, vxd, vyd, cx, cy, rank, alive, age, overflow,
                    dropped, rebins)

        (xd, yd, vxd, vyd, cx, cy, rank, alive, age, overflow, dropped,
         rebins) = jax.lax.cond(
            need, do_rebin, no_rebin,
            (xd, yd, vxd, vyd, cx, cy, rank, alive, age, overflow, dropped,
             rebins))
        ref_xd = jnp.where(need, xd, ref_xd)
        ref_yd = jnp.where(need, yd, ref_yd)

        # per-step halo: current neighbour edge values into ghost columns
        xd = sh._fill_ghost_cols(xd, nxl, D, FAR)
        yd = sh._fill_ghost_cols(yd, nxl, D, FAR)
        vxd = sh._fill_ghost_cols(vxd, nxl, D, 0.0)
        vyd = sh._fill_ghost_cols(vyd, nxl, D, 0.0)

        rho_d = density_fn(xd, yd, params)
        rho_d = sh._fill_ghost_cols(rho_d, nxl, D, 0.0)
        ax_d, ay_d = forces_fn(xd, yd, vxd, vyd, rho_d, params)
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

        r1 = lambda a: a.reshape((1,) + a.shape)
        return tuple(map(r1, (xd, yd, vxd, vyd, rho_d, ref_xd, ref_yd,
                              cx, cy, rank, alive, age + 1, overflow,
                              dropped, rebins)))

    dense_specs = (P(AXIS),) * 15
    init_sharded = jax.shard_map(
        local_init, mesh=mesh,
        in_specs=(P(AXIS),) * 5 + (P(),),
        out_specs=dense_specs, check_vma=False)
    step_sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=dense_specs + (P(),),
        out_specs=dense_specs, check_vma=False)

    @jax.jit
    def init_fn(s: sh.ShardedState) -> ShardedDenseSim:
        out = init_sharded(s.x, s.y, s.vx, s.vy, s.alive, s.step)
        (xd, yd, vxd, vyd, rho_d, rxd, ryd, cx, cy, rank, alive, age, ovf,
         drp, rbc) = out
        return ShardedDenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                               ref_xd=rxd, ref_yd=ryd, cx=cx, cy=cy,
                               rank=rank, alive=alive, age=age, overflow=ovf,
                               dropped=drp, rebin_count=rbc, step=s.step)

    @jax.jit
    def step_fn(sim: ShardedDenseSim) -> ShardedDenseSim:
        out = step_sharded(sim.xd, sim.yd, sim.vxd, sim.vyd, sim.rho_d,
                           sim.ref_xd, sim.ref_yd, sim.cx, sim.cy, sim.rank,
                           sim.alive, sim.age, sim.overflow, sim.dropped,
                           sim.rebin_count, sim.step)
        (xd, yd, vxd, vyd, rho_d, rxd, ryd, cx, cy, rank, alive, age, ovf,
         drp, rbc) = out
        return ShardedDenseSim(xd=xd, yd=yd, vxd=vxd, vyd=vyd, rho_d=rho_d,
                               ref_xd=rxd, ref_yd=ryd, cx=cx, cy=cy,
                               rank=rank, alive=alive, age=age, overflow=ovf,
                               dropped=drp, rebin_count=rbc,
                               step=sim.step + 1)

    return init_fn, step_fn


def extract_state(sim: ShardedDenseSim, spec: sh.ShardSpec,
                  params: FluidParams) -> sh.ShardedState:
    """Per-particle view for rendering/analysis (off the hot path;
    vmapped over the device axis)."""
    g = spec.local_grid

    def per_device(xd, yd, vxd, vyd, rho_d, cx, cy, rank, alive):
        x, y, vx, vy, rho = gather_slots(
            g, cx, cy, rank, [xd, yd, vxd, vyd, rho_d],
            [FAR, FAR, 0.0, 0.0, 0.0])
        rho = jnp.where(alive, rho, 0.0)
        return x, y, vx, vy, rho

    x, y, vx, vy, rho = jax.vmap(per_device)(
        sim.xd, sim.yd, sim.vxd, sim.vyd, sim.rho_d,
        sim.cx, sim.cy, sim.rank, sim.alive)
    return sh.ShardedState(
        x=x, y=y, vx=vx, vy=vy, rho=rho,
        p=jnp.where(sim.alive, eos_pressure(rho, params), 0.0),
        alive=sim.alive, step=sim.step)
