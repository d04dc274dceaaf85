"""Component-level step profiling on the real chip.

Times each piece of the flagship step inside a lax.scan (per-dispatch tunnel
latency ~27 ms on this rig makes anything else meaningless) with non-foldable
keep-alives.  Drives the roofline accounting in BASELINE.md and the attack on
the 10k fixed floor / 1M slot-occupancy waste (VERDICT r1 items 4-5).

  python tools/profile_step.py --n 10000
  python tools/profile_step.py --n 1000000
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import grid_solver, pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops import binning


def scan_time(body, init, iters: int, reps: int = 3) -> float:
    """Seconds per iteration of ``body`` (carry -> carry) inside lax.scan."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)[0]
    out = jax.block_until_ready(run(init))        # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def keepalive(x, salt):
    # never multiply by 0.0 (XLA folds x*0); 1e-30 keeps the value live
    return x + salt * 1e-30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--cap", type=int, default=8)
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    iters = args.iters or max(20, min(300, 3_000_000 // max(n // 100, 1)))
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=args.cap,
                                      skin_factor=1.5)
    print(f"# n={n} grid nx={grid.nx} ny={grid.ny} nx_pad={grid.nx_pad} "
          f"ny_pad={grid.ny_pad} cap={grid.cap} blocks={grid.n_row_blocks} "
          f"iters={iters}", file=sys.stderr)
    dense_mb = grid.ny_pad * grid.cap * grid.nx_pad * 4 / 1e6
    print(f"# dense field = {dense_mb:.2f} MB; 5 fields in flight",
          file=sys.stderr)

    sim0 = verlet_solver.init_dense(state, grid)
    density_fn, forces_fn = pallas_solver.make_stencils(grid)

    rows = []

    def report(name, sec):
        rows.append((name, sec))
        print(f"{name:34s} {sec * 1e3:8.3f} ms  "
              f"({n / sec / 1e6:10.1f} M pstep/s-equiv)", file=sys.stderr)

    # 1. full flagship step (the bench number)
    stepf = verlet_solver.make_step(params, cfg, grid)
    report("verlet full step", scan_time(stepf, sim0, iters))

    # 2. density kernel alone
    def dens_body2(c):
        xd, yd = c
        rho = density_fn(xd, yd, params)
        return keepalive(xd, rho), yd
    report("density pallas", scan_time(
        dens_body2, (sim0.xd, sim0.yd), iters))

    # 3. forces kernel alone (rho precomputed once)
    rho0 = density_fn(sim0.xd, sim0.yd, params)

    def force_body(c):
        xd, yd, vxd, vyd, rho = c
        ax, ay = forces_fn(xd, yd, vxd, vyd, rho, params)
        return (keepalive(xd, ax), yd, keepalive(vxd, ay), vyd, rho)
    report("forces pallas", scan_time(
        force_body, (sim0.xd, sim0.yd, sim0.vxd, sim0.vyd, rho0), iters))

    # 3b. the round-3 fused forces+integrate+trigger kernel (the production
    #     step is density + this — nothing else between rebins)
    def fused_body(c):
        xd, yd, vxd, vyd, rho, rx, ry = c
        nx_, ny_, nvx, nvy, disp2 = pallas_solver.forces_integrate_pallas(
            xd, yd, vxd, vyd, rho, rx, ry, params, cfg, grid)
        return (keepalive(nx_, disp2), ny_, nvx, nvy, rho, rx, ry)
    report("fused forces+integrate", scan_time(
        fused_body, (sim0.xd, sim0.yd, sim0.vxd, sim0.vyd, rho0,
                     sim0.ref_xd, sim0.ref_yd), iters))

    # 4. dense elementwise integrate + bounce + displacement reduction
    def integ_body(c):
        xd, yd, vxd, vyd, ref = c
        vx = vxd + 0.001
        vy = vyd - 9.81 * 5e-4
        x = xd + vx * 5e-4
        y = yd + vy * 5e-4
        dx = x - ref
        disp2 = jnp.max(dx * dx)
        return (keepalive(x, disp2), y, vx, vy, ref)
    report("integrate+disp reduction", scan_time(
        integ_body, (sim0.xd, sim0.yd, sim0.vxd, sim0.vyd, sim0.ref_xd),
        iters))

    # 5. rebin machinery: the local reslot kernel (current) vs the
    #    sort-based from-scratch path (what it replaced)
    from bevy_gpu_fluid_tpu.ops import reslot as reslot_ops
    reslot = reslot_ops.make_reslot(grid, use_pallas=True)
    import dataclasses as _dc

    def reslot_body(c):
        sim = c
        xd, yd, vxd, vyd, idx_d, cnt = reslot(sim.xd, sim.yd, sim.vxd,
                                              sim.vyd, sim.idx_d)
        return _dc.replace(sim, xd=xd, yd=yd, vxd=vxd, vyd=vyd, idx_d=idx_d,
                           overflow=sim.overflow + jnp.sum(cnt) * 0
                           + (jnp.sum(cnt) - jnp.sum(
                               jnp.minimum(cnt, grid.cap))).astype(jnp.int32))
    rebin_iters = max(3, iters // 10)
    report("rebin: local reslot kernel", scan_time(
        reslot_body, sim0, rebin_iters))

    def sort_rebin_body(c):
        sim = c
        x, y, vx, vy, _ = verlet_solver.extract_fields(sim, grid, params, n)
        b, xd, yd, vxd, vyd = verlet_solver._bin_now(
            x, y, vx, vy, grid, alive=x < binning.FAR * 0.5)
        idx_d = binning.to_dense(b, jnp.arange(n, dtype=jnp.int32), fill=-1)
        return _dc.replace(sim, xd=xd, yd=yd, vxd=vxd, vyd=vyd, idx_d=idx_d)
    report("rebin: sort-based (old)", scan_time(
        sort_rebin_body, sim0, rebin_iters))

    # 5b. on-demand extraction (per multi_step call, not per step)
    def extract_body(c):
        sim, acc = c
        x, y, vx, vy, rho = verlet_solver.extract_fields(sim, grid, params, n)
        return sim, acc + x[0] * 1e-30
    report("extract_fields (on demand)", scan_time(
        extract_body, (sim0, jnp.float32(0)), rebin_iters))

    # 6. eager pallas full step (rebin every step)
    def eager_body(c):
        s = c
        return pallas_solver.step(s, params, cfg, grid)
    report("eager pallas full step", scan_time(eager_body, state, rebin_iters))

    total = dict(rows)
    known = (total.get("density pallas", 0) + total.get("forces pallas", 0)
             + total.get("integrate+disp reduction", 0))
    print(f"# stencils+integrate account for {known * 1e3:.3f} ms of "
          f"{total.get('verlet full step', 0) * 1e3:.3f} ms full step",
          file=sys.stderr)


if __name__ == "__main__":
    main()
