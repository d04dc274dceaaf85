"""Double-buffered slab DMA for the fused kernel: program r prefetches
program r+1's slabs (scratch persists across sequential grid iterations on
the core), so the halo transfers hide behind the previous block's pair
loop.  A/B vs the production kernel at 1M.

  python tools/exp_dbuf.py --n 1000000
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.models.pallas_solver import (_params_cfg_vec, _roll,
                                                     _shift)
from bevy_gpu_fluid_tpu.core.params import GRAVITY_Y
from bevy_gpu_fluid_tpu.ops.reslot import block_kmax3

_EPS = 1e-6


def _dbuf_kernel(pr, occ, x_hbm, y_hbm, vx_hbm, vy_hbm, rho_hbm,
                 refx_hbm, refy_hbm,
                 ox_ref, oy_ref, ovx_ref, ovy_ref, disp_ref,
                 xs, ys, vxs, vys, ps, irs, rxs, rys, sems, *, tb, nb):
    r = pl.program_id(0)

    def start_copies(rr, slot):
        row_start = (rr + 1) * tb - 1
        for i, hbm in enumerate((x_hbm, y_hbm, vx_hbm, vy_hbm, rho_hbm)):
            buf = (xs, ys, vxs, vys, ps)[i]
            pltpu.make_async_copy(hbm.at[pl.ds(row_start, tb + 2)],
                                  buf.at[slot], sems.at[slot, i]).start()
        pltpu.make_async_copy(refx_hbm.at[pl.ds(row_start + 1, tb)],
                              rxs.at[slot], sems.at[slot, 5]).start()
        pltpu.make_async_copy(refy_hbm.at[pl.ds(row_start + 1, tb)],
                              rys.at[slot], sems.at[slot, 6]).start()

    def wait_main(slot):
        # wait the 5 pair-loop slabs (ref slabs waited in the epilogue)
        for i, buf in enumerate((xs, ys, vxs, vys, ps)):
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, tb + 2)],  # sizes only
                                  buf.at[slot], sems.at[slot, i]).wait()

    slot = jax.lax.rem(r, 2)
    nslot = jax.lax.rem(r + 1, 2)

    @pl.when(r == 0)
    def _():
        start_copies(0, 0)

    @pl.when(r + 1 < nb)
    def _():
        start_copies(r + 1, nslot)

    wait_main(slot)

    h = pr[0, 0]
    m = pr[0, 1]
    rho0 = pr[0, 2]
    k = pr[0, 3]
    mu = pr[0, 4]
    dt = pr[1, 0]
    x_min = pr[1, 1]
    x_max = pr[1, 2]
    bounce = pr[1, 3]
    floor_y = pr[1, 4]
    h2 = h * h
    h5 = (h2 * h2) * h
    spiky_c = -10.0 / (jnp.pi * h5)
    visc_c = 40.0 / (jnp.pi * h5)

    xs_s = xs.at[slot]
    ys_s = ys.at[slot]
    vxs_s = vxs.at[slot]
    vys_s = vys.at[slot]
    ps_s = ps.at[slot]
    irs_s = irs.at[slot]

    rho_slab = ps_s[...]
    irs_s[...] = 1.0 / jnp.maximum(rho_slab, 1e-12)
    ps_s[...] = k * jnp.maximum(rho_slab - rho0, 0.0)

    xi = _shift(xs_s[...], 0, tb)
    yi = _shift(ys_s[...], 0, tb)
    vxi = _shift(vxs_s[...], 0, tb)
    vyi = _shift(vys_s[...], 0, tb)
    pi_ = _shift(ps_s[...], 0, tb)

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    def body(kj, carry):
        ax, ay = carry
        xkf = xs_s[:, pl.ds(kj, 1), :]
        ykf = ys_s[:, pl.ds(kj, 1), :]
        vxkf = vxs_s[:, pl.ds(kj, 1), :]
        vykf = vys_s[:, pl.ds(kj, 1), :]
        pkf = ps_s[:, pl.ds(kj, 1), :]
        ikf = irs_s[:, pl.ds(kj, 1), :]
        for dx in (-1, 0, 1):
            rxf, ryf = _roll(xkf, dx), _roll(ykf, dx)
            rvxf, rvyf = _roll(vxkf, dx), _roll(vykf, dx)
            rpf, rif = _roll(pkf, dx), _roll(ikf, dx)
            for dy in (-1, 0, 1):
                rx, ry = _shift(rxf, dy, tb), _shift(ryf, dy, tb)
                rvx, rvy = _shift(rvxf, dy, tb), _shift(rvyf, dy, tb)
                rp, ri = _shift(rpf, dy, tb), _shift(rif, dy, tb)
                ddx = xi - rx
                ddy = yi - ry
                r2 = ddx * ddx + ddy * ddy
                inv_r = jax.lax.rsqrt(r2 + _EPS * _EPS)
                dist = r2 * inv_r
                hr = jnp.maximum(h - dist, 0.0)
                fac_p = (-m * 0.5) * (pi_ + rp) * ri \
                    * (spiky_c * hr * hr * inv_r)
                fac_v = (mu * m * visc_c) * ri * hr
                ax = ax + (fac_p * ddx + fac_v * (rvx - vxi))
                ay = ay + (fac_p * ddy + fac_v * (rvy - vyi))
        return ax, ay
    ax, ay = jax.lax.fori_loop(0, kmax, body,
                               (jnp.zeros_like(xi), jnp.zeros_like(xi)))

    live = xi < 1e8
    vx = vxi + ax * dt
    vy = vyi + (ay + GRAVITY_Y) * dt
    x = xi + vx * dt
    y = yi + vy * dt
    below = y < floor_y
    y = jnp.where(below, floor_y, y)
    vy = jnp.where(below, vy * bounce, vy)
    right = x > x_max
    x = jnp.where(right, x_max, x)
    vx = jnp.where(right, vx * bounce, vx)
    left = x < x_min
    x = jnp.where(left, x_min, x)
    vx = jnp.where(left, vx * bounce, vx)
    x = jnp.where(live, x, xi)
    y = jnp.where(live, y, yi)
    ox_ref[...] = x
    oy_ref[...] = y
    ovx_ref[...] = jnp.where(live, vx, 0.0)
    ovy_ref[...] = jnp.where(live, vy, 0.0)

    for i, buf in enumerate((rxs, rys)):
        pltpu.make_async_copy(refx_hbm.at[pl.ds(0, tb)],
                              buf.at[slot], sems.at[slot, 5 + i]).wait()
    drx = x - rxs.at[slot][...]
    dry = y - rys.at[slot][...]
    d2 = jnp.where(live, drx * drx + dry * dry, 0.0)
    disp_ref[...] = jnp.full((1, 8, 128), jnp.max(d2), jnp.float32)


def make_dbuf(grid, cfg, params):
    tb = grid.row_block
    nb = grid.n_row_blocks
    kernel = functools.partial(_dbuf_kernel, tb=tb, nb=nb)

    def fn(xd, yd, vxd, vyd, rho_d, ref_xd, ref_yd, occ):
        out = jax.ShapeDtypeStruct(xd.shape, jnp.float32)
        dshape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)
        block = pl.BlockSpec((tb, grid.cap, grid.nx_pad),
                             lambda r: (r + 1, 0, 0))
        dblock = pl.BlockSpec((1, 8, 128), lambda r: (r, 0, 0))
        slab2 = pltpu.VMEM((2, tb + 2, grid.cap, grid.nx_pad), jnp.float32)
        ref2 = pltpu.VMEM((2, tb, grid.cap, grid.nx_pad), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((2, 8), lambda r: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((3, nb), lambda r: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
            out_specs=(block, block, block, block, dblock),
            out_shape=(out, out, out, out, dshape),
            scratch_shapes=[slab2] * 6 + [ref2] * 2
            + [pltpu.SemaphoreType.DMA((2, 7))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(_params_cfg_vec(params, cfg), occ, xd, yd, vxd, vyd, rho_d,
          ref_xd, ref_yd)
    return fn


def scan_time(body, init, iters, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)[0]
    jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()
    side = int(math.isqrt(args.n))
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8,
                                      skin_factor=1.75)
    sess = verlet_solver.Session(state, params, cfg, grid)
    sess.run(300)
    sim = sess.sim
    density_fn, _ = pallas_solver.make_stencils(grid)
    rho0 = density_fn(sim.xd, sim.yd, params)
    occ = block_kmax3(sim.xd, grid)

    def keep(a, s):
        return a + s * 1e-30

    def prod_body(c):
        xd, yd, vxd, vyd = c
        nx_, ny_, nvx, nvy, d2 = pallas_solver.forces_integrate_pallas(
            xd, yd, vxd, vyd, rho0, sim.ref_xd, sim.ref_yd, params, cfg,
            grid, occ=occ)
        return (keep(nx_, d2), ny_, nvx, nvy)

    dbuf = make_dbuf(grid, cfg, params)

    def dbuf_body(c):
        xd, yd, vxd, vyd = c
        nx_, ny_, nvx, nvy, d2 = dbuf(xd, yd, vxd, vyd, rho0,
                                      sim.ref_xd, sim.ref_yd, occ)
        return (keep(nx_, jnp.max(d2)), ny_, nvx, nvy)

    init = (sim.xd, sim.yd, sim.vxd, sim.vyd)
    t_prod = scan_time(prod_body, init, args.iters)
    t_dbuf = scan_time(dbuf_body, init, args.iters)
    print(f"production fused : {t_prod * 1e3:7.3f} ms")
    print(f"double-buffered  : {t_dbuf * 1e3:7.3f} ms")

    # correctness: identical outputs
    a = pallas_solver.forces_integrate_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd, rho0, sim.ref_xd, sim.ref_yd,
        params, cfg, grid, occ=occ)
    b = dbuf(sim.xd, sim.yd, sim.vxd, sim.vyd, rho0, sim.ref_xd,
             sim.ref_yd, occ)
    tb_ = grid.row_block
    for i in range(4):
        d = float(jnp.max(jnp.abs(a[i][tb_:-tb_] - b[i][tb_:-tb_])))
        print(f"out[{i}] interior max abs diff: {d:.3e}")


if __name__ == "__main__":
    main()
