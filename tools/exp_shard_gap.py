"""Isolate the sharded-D=1 vs flagship step-time gap on the real chip.

The D=1 sharded step runs the SAME kernels as the flagship (density +
fused forces+integrate, double-buffered DMA) — halo fills are no-ops and
the psum trigger is an identity — yet bench_sharded reads ~2.1 ms/step
where bench.py reads ~1.7 at 1M.  This times both steps inside one
lax.scan from the same initial dense state, plus sharded variants with
single features disabled, to name the cost.

  python tools/exp_shard_gap.py --n 1000000 --iters 100
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
from bevy_gpu_fluid_tpu.models import verlet_solver
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet


def scan_time(step, init, iters, reps=3):
    @jax.jit
    def run(sim):
        return jax.lax.scan(lambda s, _: (step(s), None), sim, None,
                            length=iters)[0]
    out = jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--isolate-rebin", action="store_true",
                    help="also run max_age=1 variants to split the gap "
                    "into per-step base vs per-rebin cost")
    ap.add_argument("--no-cond", action="store_true",
                    help="TIMING-ONLY floors: build both steps with "
                    "lax.cond patched to the false branch (no rebin ever) "
                    "— isolates the per-step cost of the rebin cond's "
                    "plane carry from the shard_map glue")
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    state = bgf.init_grid(side, side, 0.04)

    # flagship
    grid = verlet_solver.default_grid(params.h, -1.0, extent + 1.0,
                                      extent * 1.1 + 1.0, skin_factor=1.75)
    real_cond = jax.lax.cond

    def false_cond(pred, tf, ff, *ops):       # timing floor: never rebin
        return ff(*ops)

    if args.no_cond:
        jax.lax.cond = false_cond
    try:
        fstep = verlet_solver.make_step(params, cfg, grid, n=n)
        fsim = jax.jit(lambda s: verlet_solver.init_dense(s, grid))(state)
        t, out = scan_time(fstep, fsim, args.iters)
    finally:
        jax.lax.cond = real_cond
    rb = int(out.rebin_count)
    print(f"flagship            {t*1e3:8.3f} ms/step  rebins={rb - 1}"
          + ("  [no-cond floor]" if args.no_cond else ""))

    if args.isolate_rebin:
        # max_age=1 forces the rebin branch EVERY step; with the standard
        # run's cadence R this solves base + rebin_cost separately:
        #   T_std = base + (R/iters) * rebin_cost;  T_ma1 = base + rebin_cost
        fstep1 = verlet_solver.make_step(params, cfg, grid, n=n, max_age=1)
        t1, out1 = scan_time(fstep1, fsim, args.iters)
        r = (rb - 1) / args.iters
        rc = (t1 - t) / (1.0 - r)
        print(f"  ma1 (rebin/step)  {t1*1e3:8.3f} ms/step  "
              f"-> rebin={rc*1e3:.3f} ms, base={(t1-rc)*1e3:.3f} ms")

    spec = shard.ShardSpec.build(h=0.045 * 1.75, x_min=-1.0,
                                 x_max=extent + 1.0,
                                 y_max=extent * 1.1 + 1.0, n_devices=1,
                                 capacity=n * 2)
    mesh = shard.make_mesh(1)
    sh_state = shard.shard_state(state, spec)

    from bevy_gpu_fluid_tpu.models import pallas_solver

    real_psum = jax.lax.psum
    real_fip = pallas_solver.forces_integrate_pallas

    def no_psum(x, axis):                     # D=1 only: psum == identity
        return x

    def fip_no_lanes(*a, **kw):               # D=1 only: ghost disp == 0
        kw.pop("disp_lanes", None)
        return real_fip(*a, **kw)

    variants = {
        "sharded D=1        ": dict(),
        "  -spill (n=None)  ": dict(n_override=None),
        "  -psum trigger    ": dict(psum=no_psum),
        "  -disp_lanes mask ": dict(fip=fip_no_lanes),
        "  -both            ": dict(psum=no_psum, fip=fip_no_lanes),
    }
    if args.isolate_rebin or args.no_cond:
        variants = {"sharded D=1        ": dict()}
    for name, kw in variants.items():
        jax.lax.psum = kw.get("psum", real_psum)
        pallas_solver.forces_integrate_pallas = kw.get("fip", real_fip)
        if args.no_cond:
            jax.lax.cond = false_cond
        try:
            init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
                params, cfg, spec, mesh, fused=True,
                n=kw.get("n_override", n), **kw.get("mk", {}))
            sim = init_fn(sh_state)
            t, out = scan_time(step_fn, sim, args.iters)
        finally:
            jax.lax.psum = real_psum
            pallas_solver.forces_integrate_pallas = real_fip
            jax.lax.cond = real_cond
        srb = int(out.rebin_count.sum()) - 1
        print(f"{name}{t*1e3:8.3f} ms/step  rebins={srb}")
        if args.isolate_rebin:
            init1, step1 = shard_verlet.make_sharded_verlet_step(
                params, cfg, spec, mesh, fused=True, n=n, max_age=1)
            sim1 = init1(sh_state)
            t1, _ = scan_time(step1, sim1, args.iters)
            r = srb / args.iters
            rc = (t1 - t) / (1.0 - r)
            print(f"  ma1 (rebin/step)  {t1*1e3:8.3f} ms/step  "
                  f"-> rebin={rc*1e3:.3f} ms, base={(t1-rc)*1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
