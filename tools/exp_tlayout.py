"""Experiment: transposed dense layout [cap, rows, nx] for the stencil kernels.

Hypothesis: in the current [rows, cap, nx] layout every j-slot operand is a
[tb, 1, nx] one-sublane vector — its rolls run at 1/8 VPU utilization and
every use pays a sublane broadcast.  With the slot dim LEADING, j-vectors are
[1, tb, nx] full-sublane rows, broadcasts over the leading dim are free, and
the pair arithmetic is unchanged.  Predicted ~1.4x on the density kernel.

Measures both density kernels inside lax.scan on the same scene and checks
they agree bitwise after transpose.
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
from bevy_gpu_fluid_tpu.ops.reslot import block_kmax3


def _density_kernel_t(pr, occ, x_hbm, y_hbm, rho_ref, xs, ys, sems, *, tb):
    """Transposed layout: fields are [cap, ny_pad, nx_pad]; a program owns
    rows [(r+1)*tb, (r+1)*tb + tb).  The sublane (row) dim must DMA in
    8-aligned slices, so the slab is 3*tb rows starting at r*tb: i-rows sit
    at aligned offset tb..2tb, j-row windows are VALUE slices at tb+dy."""
    r = pl.program_id(0)
    cx = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(r * tb, 3 * tb)], xs, sems.at[0])
    cy = pltpu.make_async_copy(
        y_hbm.at[:, pl.ds(r * tb, 3 * tb)], ys, sems.at[1])
    cx.start()
    cy.start()
    cx.wait()
    cy.wait()

    h = pr[0, 0]
    m = pr[0, 1]
    h2 = h * h

    xi = jax.lax.slice_in_dim(xs[...], tb, 2 * tb, axis=1)  # aligned
    yi = jax.lax.slice_in_dim(ys[...], tb, 2 * tb, axis=1)

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])
    rho = jnp.zeros_like(xi)

    def body(kj, rho):
        # leading-dim dynamic read: one j slot, FULL sublane width,
        # shared across all 9 taps
        xkf = xs[pl.ds(kj, 1), :, :]   # [1, 3tb, nx]
        ykf = ys[pl.ds(kj, 1), :, :]
        for dx in (-1, 0, 1):
            rxf = xkf if dx == 0 else jnp.roll(xkf, -dx, axis=-1)
            ryf = ykf if dx == 0 else jnp.roll(ykf, -dx, axis=-1)
            for dy in (-1, 0, 1):
                rx = jax.lax.slice_in_dim(rxf, tb + dy, 2 * tb + dy, axis=1)
                ry = jax.lax.slice_in_dim(ryf, tb + dy, 2 * tb + dy, axis=1)
                ddx = xi - rx     # broadcast over LEADING dim: free
                ddy = yi - ry
                r2 = ddx * ddx + ddy * ddy
                d = jnp.maximum(h2 - r2, 0.0)
                rho = rho + d * d * d
        return rho
    rho = jax.lax.fori_loop(0, kmax, body, rho)

    rho_ref[...] = rho * (m * 4.0 / (jnp.pi * (h2 * h2) * (h2 * h2)))


def _forces_kernel_t(pr, occ, x_hbm, y_hbm, vx_hbm, vy_hbm, rho_hbm,
                     ax_ref, ay_ref, xs, ys, vxs, vys, ps, irs, sems, *, tb):
    r = pl.program_id(0)
    copies = [
        pltpu.make_async_copy(h.at[:, pl.ds(r * tb, 3 * tb)], s, sems.at[i])
        for i, (h, s) in enumerate([(x_hbm, xs), (y_hbm, ys), (vx_hbm, vxs),
                                    (vy_hbm, vys), (rho_hbm, ps)])]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    h = pr[0, 0]
    m = pr[0, 1]
    rho0 = pr[0, 2]
    k = pr[0, 3]
    mu = pr[0, 4]
    h2 = h * h
    h5 = (h2 * h2) * h
    spiky_c = -10.0 / (jnp.pi * h5)
    visc_c = 40.0 / (jnp.pi * h5)
    EPS = 1e-6

    rho_slab = ps[...]
    irs[...] = 1.0 / jnp.maximum(rho_slab, 1e-12)
    ps[...] = k * jnp.maximum(rho_slab - rho0, 0.0)

    def islice(a):
        return jax.lax.slice_in_dim(a, tb, 2 * tb, axis=1)
    xi, yi = islice(xs[...]), islice(ys[...])
    vxi, vyi = islice(vxs[...]), islice(vys[...])
    pi_ = islice(ps[...])

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])
    ax = jnp.zeros_like(xi)
    ay = jnp.zeros_like(xi)

    def body(kj, carry):
        ax, ay = carry
        xkf = xs[pl.ds(kj, 1), :, :]
        ykf = ys[pl.ds(kj, 1), :, :]
        vxkf = vxs[pl.ds(kj, 1), :, :]
        vykf = vys[pl.ds(kj, 1), :, :]
        pkf = ps[pl.ds(kj, 1), :, :]
        ikf = irs[pl.ds(kj, 1), :, :]
        for dy in (-1, 0, 1):
            def dsl(a):
                return jax.lax.slice_in_dim(a, tb + dy, 2 * tb + dy, axis=1)
            xkd, ykd = dsl(xkf), dsl(ykf)
            vxkd, vykd = dsl(vxkf), dsl(vykf)
            pkd, ikd = dsl(pkf), dsl(ikf)
            for dx in (-1, 0, 1):
                def rl(a):
                    return a if dx == 0 else jnp.roll(a, -dx, axis=-1)
                rx, ry = rl(xkd), rl(ykd)
                rvx, rvy = rl(vxkd), rl(vykd)
                rp, ri = rl(pkd), rl(ikd)
                ddx = xi - rx
                ddy = yi - ry
                r2 = ddx * ddx + ddy * ddy
                inv_r = jax.lax.rsqrt(r2 + EPS * EPS)
                dist = r2 * inv_r
                hr = jnp.maximum(h - dist, 0.0)
                fac_p = (-m * 0.5) * (pi_ + rp) * ri \
                    * (spiky_c * hr * hr * inv_r)
                fac_v = (mu * m * visc_c) * ri * hr
                ax = ax + (fac_p * ddx + fac_v * (rvx - vxi))
                ay = ay + (fac_p * ddy + fac_v * (rvy - vyi))
        return ax, ay
    ax, ay = jax.lax.fori_loop(0, kmax, body, (ax, ay))
    ax_ref[...] = ax
    ay_ref[...] = ay


def forces_t(xt, yt, vxt, vyt, rhot, params, grid):
    tb = grid.row_block
    kernel = functools.partial(_forces_kernel_t, tb=tb)
    slab = pltpu.VMEM((grid.cap, 3 * tb, grid.nx_pad), jnp.float32)
    occ = block_kmax3(jnp.moveaxis(xt, 0, 1), grid)
    out = jax.ShapeDtypeStruct(xt.shape, jnp.float32)
    block = pl.BlockSpec((grid.cap, tb, grid.nx_pad), lambda r: (0, r + 1, 0))
    return pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                         memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=(block, block),
        out_shape=(out, out),
        scratch_shapes=[slab] * 6 + [pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(pallas_solver._params_vec(params), occ, xt, yt, vxt, vyt, rhot)


def density_t(xt, yt, params, grid):
    tb = grid.row_block
    kernel = functools.partial(_density_kernel_t, tb=tb)
    slab = pltpu.VMEM((grid.cap, 3 * tb, grid.nx_pad), jnp.float32)
    occ = block_kmax3(jnp.moveaxis(xt, 0, 1), grid)
    return pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((grid.cap, tb, grid.nx_pad),
                               lambda r: (0, r + 1, 0)),
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        scratch_shapes=[slab, slab, pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(pallas_solver._params_vec(params), occ, xt, yt)


def scan_time(body, init, iters, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)[0]
    out = jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8,
                                      skin_factor=1.5)
    sim0 = verlet_solver.init_dense(state, grid)
    xd, yd = sim0.xd, sim0.yd
    xt = jnp.moveaxis(xd, 1, 0)   # [cap, ny_pad, nx_pad]
    yt = jnp.moveaxis(yd, 1, 0)

    density_fn, _ = pallas_solver.make_stencils(grid)
    rho_cur = jax.jit(lambda a, b: density_fn(a, b, params))(xd, yd)
    rho_t = jax.jit(lambda a, b: density_t(a, b, params, grid))(xt, yt)
    err = jnp.max(jnp.abs(jnp.moveaxis(rho_t, 0, 1) - rho_cur))
    print(f"# max |rho_t - rho_cur| = {err:.3e} (f32 order tolerance; "
          f"rho scale ~1e3)", file=sys.stderr)

    def body_cur(c):
        a, b = c
        rho = density_fn(a, b, params)
        return a + rho * 1e-30, b
    t_cur = scan_time(body_cur, (xd, yd), args.iters)

    def body_t(c):
        a, b = c
        rho = density_t(a, b, params, grid)
        return a + rho * 1e-30, b
    t_t = scan_time(body_t, (xt, yt), args.iters)

    print(f"density current [rows,cap,nx]: {t_cur * 1e3:8.3f} ms",
          file=sys.stderr)
    print(f"density transposed [cap,rows,nx]: {t_t * 1e3:8.3f} ms "
          f"({t_cur / t_t:.2f}x)", file=sys.stderr)

    # ---- forces ----
    _, forces_fn = pallas_solver.make_stencils(grid)
    vxt = jnp.moveaxis(sim0.vxd, 1, 0)
    vyt = jnp.moveaxis(sim0.vyd, 1, 0)
    axc, ayc = jax.jit(lambda *a: forces_fn(*a, params))(
        xd, yd, sim0.vxd, sim0.vyd, rho_cur)
    axt, ayt = jax.jit(lambda *a: forces_t(*a, params, grid))(
        xt, yt, vxt, vyt, rho_t)
    ferr = jnp.max(jnp.abs(jnp.moveaxis(axt, 0, 1) - axc))
    print(f"# max |ax_t - ax_cur| = {ferr:.3e}", file=sys.stderr)

    def fbody_cur(c):
        a, b, vx, vy, rho = c
        ax, ay = forces_fn(a, b, vx, vy, rho, params)
        return a + ax * 1e-30, b, vx + ay * 1e-30, vy, rho
    tf_cur = scan_time(fbody_cur, (xd, yd, sim0.vxd, sim0.vyd, rho_cur),
                       args.iters)

    def fbody_t(c):
        a, b, vx, vy, rho = c
        ax, ay = forces_t(a, b, vx, vy, rho, params, grid)
        return a + ax * 1e-30, b, vx + ay * 1e-30, vy, rho
    tf_t = scan_time(fbody_t, (xt, yt, vxt, vyt, rho_t), args.iters)

    print(f"forces current [rows,cap,nx]: {tf_cur * 1e3:8.3f} ms",
          file=sys.stderr)
    print(f"forces transposed [cap,rows,nx]: {tf_t * 1e3:8.3f} ms "
          f"({tf_cur / tf_t:.2f}x)", file=sys.stderr)


if __name__ == "__main__":
    main()
