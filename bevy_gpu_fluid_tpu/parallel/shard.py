"""Multi-chip scaling: spatial domain decomposition over a device mesh.

The reference is a single-GPU engine; its only parallelism is SIMT over
particles (SURVEY.md section 2.2).  This module adds the TPU-native scaling
story the north star demands (BASELINE.json config #5: 4M particles on
v5e-8): the domain is split into vertical slabs along x, one per device in a
1D ``jax.sharding.Mesh``, and each step runs under ``shard_map`` with three
ICI exchanges, all ``lax.ppermute`` with nearest-neighbour perms:

1. ghost-column halo of particle positions before the density stencil,
2. ghost-column halo of velocity + density before the force stencil,
3. migration of particles whose integrated position left the slab.

The single-chip Pallas/XLA kernels run unmodified on each local slab — the
halo exchange just fills the dense layout's ghost columns (ops/binning.py)
with the neighbour's real edge columns instead of FAR, which is exactly the
2h-wide block exchange of ring attention applied to space instead of
sequence.

Particle storage is a fixed-capacity SoA per device ([n_devices, capacity]
arrays sharded on axis 0) with an ``alive`` mask; dead slots carry FAR
positions.  Migration moves at most ``mig_cap`` particles per direction per
step (dam-break speeds cross far less than one cell per step at dt=5e-4);
both capacity and migration overflow are counted in the step diagnostics
rather than silently dropped.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.params import FluidParams, IntegrateConfig, GridSpec2D, GRAVITY_Y
from ..core.state import FluidState
from ..ops import integrator
from ..ops.binning import (FAR, bin_particles, to_dense, from_dense_multi)
from ..ops.kernels import eos_pressure, self_density
from ..models import grid_solver

AXIS = "x"


@partial(jax.tree_util.register_dataclass,
         data_fields=("x", "y", "vx", "vy", "rho", "p", "idx", "alive",
                      "step"),
         meta_fields=())
@dataclasses.dataclass
class ShardedState:
    """Per-device fixed-capacity SoA: float32[n_devices, capacity] fields,
    int32 idx (original particle index, -1 = dead — the analog of the
    reference's stable SSBO array index, which its parity harnesses compare
    by, reference: examples/gpu_parity10.rs:104-139), bool alive, int32
    step."""

    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    rho: jax.Array
    p: jax.Array
    idx: jax.Array
    alive: jax.Array
    step: jax.Array


@partial(jax.tree_util.register_dataclass,
         data_fields=("overflow", "dropped", "alive_count"), meta_fields=())
@dataclasses.dataclass
class ShardDiag:
    overflow: jax.Array     # [D] cell-cap overflow per device
    dropped: jax.Array      # [D] particles lost to capacity/migration limits
    alive_count: jax.Array  # [D]


@dataclasses.dataclass(frozen=True)
class ShardSpec:
    """Static decomposition: the global grid split into n_devices slabs of
    nx_local columns; per-device particle capacity and migration buffer."""

    n_devices: int
    nx_local: int
    local_grid: GridSpec2D   # nx == nx_local, origin at slab 0
    global_x0: float         # world x of global grid origin
    capacity: int
    mig_cap: int

    @property
    def slab_width(self) -> float:
        return self.nx_local * self.local_grid.cell_size

    @staticmethod
    def build(h: float, x_min: float, x_max: float, y_max: float,
              n_devices: int, capacity: int, cap: int = 8,
              mig_cap: int | None = None) -> "ShardSpec":
        g = GridSpec2D.from_bounds(h=h, x_min=x_min, x_max=x_max, y_min=0.0,
                                   y_max=y_max, cap=cap)
        nx_local = -(-g.nx // n_devices)
        local = dataclasses.replace(g, nx=nx_local)
        # width-adaptive row blocks, as the flagship's default_grid: past
        # ~6016 pad lanes the fused forces kernel's scoped VMEM exceeds
        # the 100 MB stack limit at tb=8 (the 160M/device step_until
        # compile fault: 104.48M of 100M at nx_pad 6528) — drop to the
        # wide-grid 4-row blocks exactly where the single-chip path does
        from ..models.pallas_solver import pick_row_block
        tb = pick_row_block(local.nx_pad)
        if tb != local.row_block:
            local = dataclasses.replace(local, row_block=tb)
        return ShardSpec(n_devices=n_devices, nx_local=nx_local,
                         local_grid=local, global_x0=g.origin_x,
                         capacity=capacity,
                         mig_cap=mig_cap if mig_cap is not None
                         else max(256, capacity // 8))


def shard_state(state: FluidState, spec: ShardSpec) -> ShardedState:
    """Partition a FluidState by x-slab into [D, capacity] device buffers.
    Slot i carries its ORIGINAL particle index in ``idx`` (globally unique;
    preserved across migration and rebinning — identity is first-class, as
    the reference's SSBO array index was).  Raises if any slab exceeds
    capacity."""
    import numpy as np
    D, M = spec.n_devices, spec.capacity
    x = np.asarray(state.x)
    slab = np.clip(((x - spec.global_x0) // spec.slab_width).astype(int),
                   0, D - 1)
    out = {k: np.full((D, M), FAR if k in ("x", "y") else 0.0,
                      dtype=np.float32)
           for k in ("x", "y", "vx", "vy", "rho", "p")}
    ids = np.full((D, M), -1, dtype=np.int32)
    alive = np.zeros((D, M), bool)
    for d in range(D):
        idx = np.nonzero(slab == d)[0]
        if len(idx) > M:
            raise ValueError(f"slab {d} holds {len(idx)} > capacity {M}")
        for k in out:
            out[k][d, :len(idx)] = np.asarray(getattr(state, k))[idx]
        ids[d, :len(idx)] = idx
        alive[d, :len(idx)] = True
    # step goes through host numpy: the input state may be committed to a
    # DIFFERENT mesh (re-sharding an extracted multi-chip state), and a
    # committed scalar would poison the target mesh's jit with an
    # incompatible-devices error
    return ShardedState(step=jnp.asarray(np.asarray(state.step)),
                        alive=jnp.asarray(alive), idx=jnp.asarray(ids),
                        **{k: jnp.asarray(v) for k, v in out.items()})


def unshard_state(sharded: ShardedState) -> FluidState:
    """Flatten live particles back to a FluidState (device order, for
    rendering/analysis).  For original-order state use
    ``to_fluid_state`` — per-particle identity IS tracked."""
    import numpy as np
    alive = np.asarray(sharded.alive).reshape(-1)
    pick = lambda a: jnp.asarray(np.asarray(a).reshape(-1)[alive])
    n = int(alive.sum())
    return FluidState(x=pick(sharded.x), y=pick(sharded.y),
                      vx=pick(sharded.vx), vy=pick(sharded.vy),
                      ax=jnp.zeros((n,), jnp.float32),
                      ay=jnp.zeros((n,), jnp.float32),
                      rho=pick(sharded.rho), p=pick(sharded.p),
                      step=sharded.step)


def to_fluid_state(sharded: ShardedState, n: int) -> FluidState:
    """ORIGINAL-order FluidState: particle i of the input is particle i of
    the output, matched by the tracked ``idx`` plane (the reference-style
    per-particle view its parity harnesses diff by,
    reference: examples/gpu_integration_parity.rs:118-157).  Particles
    dropped by capacity/migration limits come back as FAR positions."""
    idx = jnp.reshape(sharded.idx, (-1,))
    ok = idx >= 0
    safe = jnp.where(ok, idx, n + (1 << 20))
    vals = jnp.stack([jnp.reshape(getattr(sharded, k), (-1,))
                      for k in ("x", "y", "vx", "vy", "rho", "p")], axis=-1)
    init = jnp.broadcast_to(
        jnp.array([FAR, FAR, 0.0, 0.0, 0.0, 0.0], jnp.float32), (n, 6))
    out = init.at[safe].set(vals, mode="drop")
    z = jnp.zeros((n,), jnp.float32)
    return FluidState(x=out[:, 0], y=out[:, 1], vx=out[:, 2], vy=out[:, 3],
                      ax=z, ay=z, rho=out[:, 4], p=out[:, 5],
                      step=sharded.step)


def _fwd_perm(D):
    return [(i, i + 1) for i in range(D - 1)]


def _bwd_perm(D):
    return [(i + 1, i) for i in range(D - 1)]


def _fill_ghost_cols(fd: jax.Array, nxl: int, D: int,
                     edge_fill: float) -> jax.Array:
    """Receive both neighbours' real edge columns into my ghost columns
    (cols 0 and nxl+1).  Devices with no neighbour on a side get
    ``edge_fill`` (FAR for positions: outermost walls have no fluid beyond)."""
    return _fill_ghost_cols_multi((fd,), nxl, D, (edge_fill,))[0]


def _fill_ghost_cols_multi(fields, nxl: int, D: int, fills):
    """``_fill_ghost_cols`` for several planes with ONE ppermute pair:
    only the edge COLUMNS are stacked ([F, ny_pad, cap, 1] — a few hundred
    KB), so F planes cost the same two collective launches as one.  Bitwise
    identical to per-plane exchanges (same bytes move, same updates).
    Returns the fields as a list, same order."""
    fields = list(fields)
    if D == 1:
        return fields
    my_right = jnp.stack(
        [jax.lax.slice_in_dim(f, nxl, nxl + 1, axis=2) for f in fields])
    my_left = jnp.stack(
        [jax.lax.slice_in_dim(f, 1, 2, axis=2) for f in fields])
    from_left = jax.lax.ppermute(my_right, AXIS, _fwd_perm(D))
    from_right = jax.lax.ppermute(my_left, AXIS, _bwd_perm(D))
    d = jax.lax.axis_index(AXIS)
    fillv = jnp.asarray(fills, from_left.dtype).reshape(-1, 1, 1, 1)
    from_left = jnp.where(d == 0, fillv, from_left)
    from_right = jnp.where(d == D - 1, fillv, from_right)
    return [
        jax.lax.dynamic_update_slice_in_dim(
            jax.lax.dynamic_update_slice_in_dim(f, from_left[i], 0, axis=2),
            from_right[i], nxl + 1, axis=2)
        for i, f in enumerate(fields)]


def _pack_migrants(fields, mask, E):
    """Select up to E masked entries into fixed [E] buffers; returns packed
    fields + validity + count of entries beyond E (dropped)."""
    order = jnp.argsort(~mask)          # stable: masked slots first
    idx = order[:E]
    ok = mask[idx]
    packed = [jnp.where(ok, f[idx], fill) for f, fill in fields]
    dropped = jnp.sum(mask) - jnp.sum(ok)
    return packed, ok, dropped


def make_sharded_step(params: FluidParams, cfg: IntegrateConfig,
                      spec: ShardSpec, mesh: Mesh, stencils=None):
    """Build the jitted multi-chip step: returns fn(ShardedState) ->
    (ShardedState, ShardDiag)."""
    g = spec.local_grid
    D, M, E = spec.n_devices, spec.capacity, spec.mig_cap
    nxl = spec.nx_local
    if stencils is None:
        stencils = grid_solver.XLA_STENCILS
    density_fn, forces_fn = stencils

    def local_step(x, y, vx, vy, rho_o, p_o, idx, alive, step):
        x, y, vx, vy, idx, alive = (a.reshape(a.shape[1:])
                                    for a in (x, y, vx, vy, idx, alive))
        d = jax.lax.axis_index(AXIS)
        ox = spec.global_x0 + d.astype(jnp.float32) * spec.slab_width
        origin = (ox, g.origin_y)

        # dead slots must scatter FAR/0 so ghost rows stay inert
        xb = jnp.where(alive, x, FAR)
        yb = jnp.where(alive, y, FAR)
        vxb = jnp.where(alive, vx, 0.0)
        vyb = jnp.where(alive, vy, 0.0)

        b = bin_particles(xb, yb, g, alive=alive, origin=origin, with_csr=False)
        xd = to_dense(b, xb, fill=FAR)
        yd = to_dense(b, yb, fill=FAR)

        # halo 1: neighbour edge positions into my ghost columns
        xd, yd = _fill_ghost_cols_multi((xd, yd), nxl, D, (FAR, FAR))

        rho_d = density_fn(xd, yd, params)

        vxd = to_dense(b, vxb, fill=0.0)
        vyd = to_dense(b, vyb, fill=0.0)
        # halo 2: neighbour edge velocity + density (positions already in)
        vxd, vyd, rho_d = _fill_ghost_cols_multi(
            (vxd, vyd, rho_d), nxl, D, (0.0, 0.0, 0.0))

        ax_d, ay_d = forces_fn(xd, yd, vxd, vyd, rho_d, params)

        self_rho = self_density(params)
        rho_g, ax_g, ay_g = from_dense_multi(
            b, [rho_d, ax_d, ay_d], [self_rho, 0.0, 0.0])
        rho = jnp.where(alive, rho_g, 0.0)
        p = jnp.where(alive, eos_pressure(rho, params), 0.0)
        ax = jnp.where(alive, ax_g, 0.0)
        ay = jnp.where(alive, ay_g + GRAVITY_Y, 0.0)

        x2, y2, vx2, vy2 = integrator.euler(x, y, vx, vy, ax, ay, cfg.dt)
        x2, y2, vx2, vy2 = integrator.boundaries(x2, y2, vx2, vy2, cfg)
        x2 = jnp.where(alive, x2, FAR)
        y2 = jnp.where(alive, y2, FAR)

        # migration: who left my slab?
        slab_lo = ox
        slab_hi = ox + spec.slab_width
        go_left = alive & (x2 < slab_lo) & (d > 0)
        go_right = alive & (x2 >= slab_hi) & (d < D - 1)
        stay = alive & ~go_left & ~go_right

        dropped = jnp.int32(0)
        if D > 1:
            # identity rides the exchange bitcast to f32 (exact round-trip;
            # a plain cast would lose indices past 2^24)
            idx_f = jax.lax.bitcast_convert_type(idx, jnp.float32)
            dead_if = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
            fields = lambda: [(x2, FAR), (y2, FAR), (vx2, 0.0), (vy2, 0.0),
                              (idx_f, dead_if)]
            pl_, okl, dl = _pack_migrants(fields(), go_left, E)
            pr_, okr, dr = _pack_migrants(fields(), go_right, E)
            dropped = dropped + dl + dr

            send_r = jnp.stack(pr_ + [okr.astype(jnp.float32)])   # [6, E]
            send_l = jnp.stack(pl_ + [okl.astype(jnp.float32)])
            recv_l = jax.lax.ppermute(send_r, AXIS, _fwd_perm(D))
            recv_r = jax.lax.ppermute(send_l, AXIS, _bwd_perm(D))
            # devices with no neighbour receive zeros -> ok flag 0 = dead

            def unpack(buf):
                ok = buf[5] > 0.5
                vals = [jnp.where(ok, buf[i], FAR if i < 2 else 0.0)
                        for i in range(4)]
                ids = jnp.where(ok, jax.lax.bitcast_convert_type(
                    buf[4], jnp.int32), -1)
                return vals, ids, ok

            (inl, idl_in, okl_in) = unpack(recv_l)
            (inr, idr_in, okr_in) = unpack(recv_r)

            all_alive = jnp.concatenate([stay, okl_in, okr_in])
            cat = lambda f, a, bb: jnp.concatenate([f, a, bb])
            allx = cat(jnp.where(stay, x2, FAR), inl[0], inr[0])
            ally = cat(jnp.where(stay, y2, FAR), inl[1], inr[1])
            allvx = cat(jnp.where(stay, vx2, 0.0), inl[2], inr[2])
            allvy = cat(jnp.where(stay, vy2, 0.0), inl[3], inr[3])
            allrho = cat(jnp.where(stay, rho, 0.0), okl_in * 0.0, okr_in * 0.0)
            allp = cat(jnp.where(stay, p, 0.0), okl_in * 0.0, okr_in * 0.0)
            allidx = cat(jnp.where(stay, idx, -1), idl_in, idr_in)

            order = jnp.argsort(~all_alive)[:M]   # stable compaction
            new_alive = all_alive[order]
            dropped = dropped + jnp.sum(all_alive) - jnp.sum(new_alive)
            x2, y2 = allx[order], ally[order]
            vx2, vy2 = allvx[order], allvy[order]
            rho, p = allrho[order], allp[order]
            idx = allidx[order]
            alive = new_alive
        else:
            alive = stay
        idx = jnp.where(alive, idx, -1)

        diag_overflow = b.overflow.reshape(1)
        diag_dropped = dropped.astype(jnp.int32).reshape(1)
        diag_alive = jnp.sum(alive).astype(jnp.int32).reshape(1)
        r1 = lambda a: a.reshape((1,) + a.shape)
        return (r1(x2), r1(y2), r1(vx2), r1(vy2), r1(rho), r1(p), r1(idx),
                r1(alive), diag_overflow, diag_dropped, diag_alive)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS),) * 8 + (P(),),
        out_specs=(P(AXIS),) * 8 + (P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False)

    @jax.jit
    def step(s: ShardedState):
        (x, y, vx, vy, rho, p, idx, alive, ovf, drp, cnt) = sharded(
            s.x, s.y, s.vx, s.vy, s.rho, s.p, s.idx, s.alive, s.step)
        return (ShardedState(x=x, y=y, vx=vx, vy=vy, rho=rho, p=p, idx=idx,
                             alive=alive, step=s.step + 1),
                ShardDiag(overflow=ovf, dropped=drp, alive_count=cnt))

    return step


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1D mesh over the first n_devices devices.  Raises (rather than
    silently building a smaller mesh) when the initialized backend cannot
    supply that many — a truncated mesh hands shard_map the full array per
    "shard" and fails later with an opaque reshape error."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}): backend '{jax.default_backend()}' has only "
            f"{len(devs)} device(s). For a virtual CPU mesh, set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"force the CPU platform BEFORE JAX initializes.")
    return Mesh(devs[:n], (AXIS,))
