"""Forces-kernel roofline attack (VERDICT r2 item 3): A/B variants at 1M.

BASELINE.md r2: density 0.45 ms = 89% of its VPU roofline, forces 1.47 ms =
69% (roofline 1.01 ms).  Suspects named there: the rsqrt expansion and
fori-loop bookkeeping.  This harness times kernel variants inside lax.scan
on the real chip:

  v0   current forces_pallas
  v0nr v0 with rsqrt replaced by a constant      (quantifies rsqrt's share)
  v1   strength-reduced: constants folded (C1 = -m/2*spiky_c into one
       scalar), shared subexpressions (u = (p_i+p_j)*ri, w = hr^2*inv_r)
  v2   v1 + vxi/vyi factored OUT of the pair loop: sum fac_v separately
       (3rd carry) and subtract vxi*S_v once after the loop — saves one
       subtract per pair component at the cost of one extra accumulator

  python tools/exp_forces.py --n 1000000
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
from bevy_gpu_fluid_tpu.models.pallas_solver import (_copy_slab, _params_vec,
                                                     _roll, _shift, _slab)
from bevy_gpu_fluid_tpu.ops.reslot import block_kmax3

_EPS = 1e-6


def _forces_kernel_v(pr, occ, x_hbm, y_hbm, vx_hbm, vy_hbm, rho_hbm,
                     ax_ref, ay_ref, xs, ys, vxs, vys, ps, irs, sems, *, tb,
                     variant):
    r = pl.program_id(0)
    row_start = (r + 1) * tb - 1
    copies = [
        _copy_slab(x_hbm, xs, sems.at[0], row_start, tb + 2),
        _copy_slab(y_hbm, ys, sems.at[1], row_start, tb + 2),
        _copy_slab(vx_hbm, vxs, sems.at[2], row_start, tb + 2),
        _copy_slab(vy_hbm, vys, sems.at[3], row_start, tb + 2),
        _copy_slab(rho_hbm, ps, sems.at[4], row_start, tb + 2),
    ]
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
    C1 = (-m * 0.5) * spiky_c          # folded pressure constant
    C2 = mu * m * visc_c               # folded viscosity constant

    rho_slab = ps[...]
    irs[...] = 1.0 / jnp.maximum(rho_slab, 1e-12)
    ps[...] = k * jnp.maximum(rho_slab - rho0, 0.0)

    xi = _shift(xs[...], 0, tb)
    yi = _shift(ys[...], 0, tb)
    vxi = _shift(vxs[...], 0, tb)
    vyi = _shift(vys[...], 0, tb)
    pi_ = _shift(ps[...], 0, tb)

    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    if variant in ("v0", "v0nr"):
        def body(kj, carry):
            ax, ay = carry
            xkf = xs[:, pl.ds(kj, 1), :]
            ykf = ys[:, pl.ds(kj, 1), :]
            vxkf = vxs[:, pl.ds(kj, 1), :]
            vykf = vys[:, pl.ds(kj, 1), :]
            pkf = ps[:, pl.ds(kj, 1), :]
            ikf = irs[:, pl.ds(kj, 1), :]
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
                    if variant == "v0nr":
                        inv_r = r2 + _EPS                  # WRONG physics,
                    else:                                  # same op count
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

    elif variant == "v1":
        def body(kj, carry):
            ax, ay = carry
            xkf = xs[:, pl.ds(kj, 1), :]
            ykf = ys[:, pl.ds(kj, 1), :]
            vxkf = vxs[:, pl.ds(kj, 1), :]
            vykf = vys[:, pl.ds(kj, 1), :]
            pkf = ps[:, pl.ds(kj, 1), :]
            ikf = irs[:, pl.ds(kj, 1), :]
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
                    hr = jnp.maximum(h - r2 * inv_r, 0.0)
                    u = (pi_ + rp) * ri
                    fac_p = (C1 * u) * (hr * hr * inv_r)
                    fac_v = (C2 * hr) * ri
                    ax = ax + (fac_p * ddx + fac_v * (rvx - vxi))
                    ay = ay + (fac_p * ddy + fac_v * (rvy - vyi))
            return ax, ay
        ax, ay = jax.lax.fori_loop(0, kmax, body,
                                   (jnp.zeros_like(xi), jnp.zeros_like(xi)))

    elif variant == "v3":
        # v2's arithmetic, TWO j slots per fori iteration (unroll-by-2,
        # two 1-sublane dynamic reads — a dynamic 2-sublane vector.load
        # does not lower in Mosaic): halves the loop-carry bookkeeping;
        # odd kmax rounds up (the extra slot is empty -> FAR -> zeros)
        def body(i, carry):
            ax, ay, sv = carry
            for s in (0, 1):
                kj = i * 2 + s
                xkf = xs[:, pl.ds(kj, 1), :]
                ykf = ys[:, pl.ds(kj, 1), :]
                vxkf = vxs[:, pl.ds(kj, 1), :]
                vykf = vys[:, pl.ds(kj, 1), :]
                pkf = ps[:, pl.ds(kj, 1), :]
                ikf = irs[:, pl.ds(kj, 1), :]
                for dx in (-1, 0, 1):
                    rxf, ryf = _roll(xkf, dx), _roll(ykf, dx)
                    rvxf, rvyf = _roll(vxkf, dx), _roll(vykf, dx)
                    rpf, rif = _roll(pkf, dx), _roll(ikf, dx)
                    for dy in (-1, 0, 1):
                        rx, ry = _shift(rxf, dy, tb), _shift(ryf, dy, tb)
                        rvx = _shift(rvxf, dy, tb)
                        rvy = _shift(rvyf, dy, tb)
                        rp, ri = _shift(rpf, dy, tb), _shift(rif, dy, tb)
                        ddx = xi - rx
                        ddy = yi - ry
                        r2 = ddx * ddx + ddy * ddy
                        inv_r = jax.lax.rsqrt(r2 + _EPS * _EPS)
                        hr = jnp.maximum(h - r2 * inv_r, 0.0)
                        u = (pi_ + rp) * ri
                        fac_p = (C1 * u) * (hr * hr * inv_r)
                        fac_v = (C2 * hr) * ri
                        ax = ax + (fac_p * ddx + fac_v * rvx)
                        ay = ay + (fac_p * ddy + fac_v * rvy)
                        sv = sv + fac_v
            return ax, ay, sv
        z = jnp.zeros_like(xi)
        ax, ay, sv = jax.lax.fori_loop(0, (kmax + 1) // 2, body, (z, z, z))
        ax = ax - vxi * sv
        ay = ay - vyi * sv

    elif variant == "v2":
        def body(kj, carry):
            ax, ay, sv = carry
            xkf = xs[:, pl.ds(kj, 1), :]
            ykf = ys[:, pl.ds(kj, 1), :]
            vxkf = vxs[:, pl.ds(kj, 1), :]
            vykf = vys[:, pl.ds(kj, 1), :]
            pkf = ps[:, pl.ds(kj, 1), :]
            ikf = irs[:, pl.ds(kj, 1), :]
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
                    hr = jnp.maximum(h - r2 * inv_r, 0.0)
                    u = (pi_ + rp) * ri
                    fac_p = (C1 * u) * (hr * hr * inv_r)
                    fac_v = (C2 * hr) * ri
                    # vxi/vyi (constant over the whole pair loop) factored
                    # out: accumulate fac_v separately, subtract once after
                    ax = ax + (fac_p * ddx + fac_v * rvx)
                    ay = ay + (fac_p * ddy + fac_v * rvy)
                    sv = sv + fac_v
            return ax, ay, sv
        z = jnp.zeros_like(xi)
        ax, ay, sv = jax.lax.fori_loop(0, kmax, body, (z, z, z))
        ax = ax - vxi * sv
        ay = ay - vyi * sv

    ax_ref[...] = ax
    ay_ref[...] = ay


def make_forces(grid, variant):
    tb = grid.row_block
    kernel = functools.partial(_forces_kernel_v, tb=tb, variant=variant)

    def forces_fn(xd, yd, vxd, vyd, rho_d, params):
        occ = block_kmax3(xd, grid)
        out = jax.ShapeDtypeStruct(xd.shape, jnp.float32)
        block = pl.BlockSpec((tb, grid.cap, grid.nx_pad),
                             lambda r: (r + 1, 0, 0))
        return pl.pallas_call(
            kernel,
            grid=(grid.n_row_blocks,),
            in_specs=[pl.BlockSpec((1, 8), lambda r: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=(block, block),
            out_shape=(out, out),
            scratch_shapes=[_slab(grid)] * 6
            + [pltpu.SemaphoreType.DMA((5,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(_params_vec(params), occ, xd, yd, vxd, vyd, rho_d)
    return forces_fn


def scan_time(body, init, iters: int, reps: int = 3) -> float:
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
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--skin", type=float, default=1.75)
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8,
                                      skin_factor=args.skin)
    # develop the flow a bit so occupancy is realistic
    sess = verlet_solver.Session(state, params, cfg, grid)
    sess.run(300)
    sim = sess.sim
    density_fn, _ = pallas_solver.make_stencils(grid)
    rho0 = density_fn(sim.xd, sim.yd, params)

    def keep(x, s):
        return x + s * 1e-30

    variants = ("v0", "v0nr", "v1", "v2", "v3")
    times = {v: [] for v in variants}
    for _pass in range(2):        # two interleaved passes: expose noise
        for variant in variants:
            forces_fn = make_forces(grid, variant)

            def body(c, fn=forces_fn):
                xd, yd, vxd, vyd, rho = c
                ax, ay = fn(xd, yd, vxd, vyd, rho, params)
                return (keep(xd, ax), yd, keep(vxd, ay), vyd, rho)
            t = scan_time(body, (sim.xd, sim.yd, sim.vxd, sim.vyd, rho0),
                          args.iters)
            times[variant].append(t)
            print(f"pass{_pass} {variant:6s} {t * 1e3:7.3f} ms", flush=True)
    for v in variants:
        print(f"{v:6s} best {min(times[v]) * 1e3:7.3f} ms", flush=True)

    # numeric check: v1/v2/v3 must match v0 to f32 noise (v0nr is
    # intentionally wrong — it exists only to price the rsqrt).  Compare
    # INTERIOR blocks only: outer ghost-block outputs are never written by
    # the kernels and hold recycled-buffer garbage.
    tb = grid.row_block
    f0 = make_forces(grid, "v0")
    a0 = f0(sim.xd, sim.yd, sim.vxd, sim.vyd, rho0, params)
    for variant in ("v1", "v2", "v3"):
        fv = make_forces(grid, variant)
        av = fv(sim.xd, sim.yd, sim.vxd, sim.vyd, rho0, params)
        d = max(float(jnp.max(jnp.abs(a0[0][tb:-tb] - av[0][tb:-tb]))),
                float(jnp.max(jnp.abs(a0[1][tb:-tb] - av[1][tb:-tb]))))
        print(f"{variant} vs v0 interior max abs diff: {d:.3e}")


if __name__ == "__main__":
    main()
