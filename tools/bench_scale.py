"""Very-large-N single-chip scale benchmark (the HBM-ceiling probe).

The standard bench.py differential window holds a post-warmup snapshot to
subtract dispatch overhead — which keeps TWO copies of the dense state
alive and is exactly what you cannot afford at the HBM ceiling.  This tool
drives the large-N memory knobs instead: ``Session(init_chunks=K)`` (the
chunked init — O(N/K) transients instead of the full-[N] sort workspace)
and ``donate=True`` (the resident sim is donated into each dispatch, so
old and new dense planes never coexist).  Timing is INCLUSIVE best-of-3,
like the published 4M-64M scale points (dispatch overhead is <0.1% of a
300-step block at these sizes).

  python tools/bench_scale.py --n 96000000
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96_000_000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--skin", type=float, default=1.75)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--planar", choices=["auto", "on", "off"],
                    default="auto",
                    help="force the plane-at-a-time rebin on/off (auto = "
                    "planar_rebin_default(grid): on near the HBM ceiling)")
    ap.add_argument("--dbuf", choices=["auto", "off", "xyr", "full"],
                    default="auto",
                    help="override the fused kernel's DMA mode for A/B at "
                    "the wide grids (auto = _dbuf(grid); off forces "
                    "single-buffered; xyr/full force those modes)")
    ap.add_argument("--bisect", type=str, default="", metavar="K[,K2,...]",
                    help="fault-localization mode: after warmup, run the "
                    "measured steps in chunks of K (a comma list runs "
                    "exactly those chunk sizes in order), printing step "
                    "index, cumulative rebins and overflow after each "
                    "chunk — the last line before a device fault brackets "
                    "it to one chunk and says whether overflow had started")
    ap.add_argument("--no-recovery", action="store_true",
                    help="counted-loss overflow contract (recovery=False): "
                    "the recovery pass keeps pre-rebin planes alive through "
                    "its collect + dense-size scatter transients, which "
                    "exceeds rebin-peak HBM past ~96M particles (measured: "
                    "112M faults at the first overflow-regime rebin with "
                    "recovery on, runs clean with it off)")
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0,
                                      skin_factor=args.skin)

    from bevy_gpu_fluid_tpu.models import pallas_solver
    if args.dbuf != "auto":
        pallas_solver._DBUF_FORCE = {"off": False, "xyr": "xyr",
                                     "full": True}[args.dbuf]
    print(f"# dbuf mode: density={pallas_solver._dbuf_density(grid)} "
          f"forces={pallas_solver._dbuf(grid)}", file=sys.stderr)
    print(f"# n={n} grid {grid.ny_pad}x{grid.cap}x{grid.nx_pad} "
          f"(~{8 * grid.ny_pad * grid.cap * grid.nx_pad * 4 / 2**30:.1f} GiB "
          f"resident dense)", file=sys.stderr)

    t0 = time.time()
    planar = {"auto": None, "on": True, "off": False}[args.planar]
    # generator init: the lattice is computed chunk-by-chunk inside the
    # init scan — no [N] particle planes ever exist on device (they were
    # the 160M first-dispatch OOM: ~2.6 GiB of input planes coexisting
    # with the ~11 GiB dense carry, and donation can't alias them away)
    sess = verlet_solver.Session.from_generator(
        bgf.lattice_gen(side, 0.04), n, params, cfg, grid,
        init_chunks=args.chunks, donate=True,
        recovery=not args.no_recovery, planar_rebin=planar)
    jax.block_until_ready(sess.sim.xd)
    t_init = time.time() - t0

    t0 = time.time()
    if args.warmup_steps:
        sess.run(args.warmup_steps)
        jax.block_until_ready(sess.sim.xd)
    t_warm = time.time() - t0

    if args.bisect:
        sizes = [int(s) for s in args.bisect.split(",")]
        if len(sizes) == 1:
            total = args.steps * args.reps
            chunks, done = [], 0
            while done < total:
                chunks.append(min(sizes[0], total - done))
                done += chunks[-1]
        else:
            chunks = sizes
        done = 0
        for k in chunks:
            t0 = time.time()
            sess.run(k)
            jax.block_until_ready(sess.sim.xd)
            done += k
            print(f"# step {args.warmup_steps + done}: chunk={k} "
                  f"rebins={int(sess.sim.rebin_count)} "
                  f"overflow={sess.overflow} "
                  f"({(time.time() - t0) / k * 1e3:.1f} ms/step)",
                  file=sys.stderr, flush=True)
        print('{"metric": "bisect", "ok": true}')
        return 0

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        sess.run(args.steps)
        jax.block_until_ready(sess.sim.xd)
        best = min(best, time.time() - t0)
    ms = best / args.steps * 1e3
    rate = n / (best / args.steps)
    finite = bool(jnp.isfinite(sess.sim.xd[sess.sim.xd < 1e8]).all())
    print(f"# init+compile={t_init:.1f}s warmup={t_warm:.1f}s "
          f"{ms:.1f} ms/step = {rate / 1e6:.1f}M particle-steps/s "
          f"rebins={int(sess.sim.rebin_count)} overflow={sess.overflow} "
          f"suspended={sess.suspended} finite={finite} "
          f"rebin_mode={'planar' if sess.planar_rebin else 'fused'} "
          f"refless={sess.refless_trigger}",
          file=sys.stderr)
    print(f'{{"metric": "scale_psteps_per_sec_{n // 1_000_000}M", '
          f'"value": {rate:.1f}, "unit": "particle-steps/s", '
          f'"ok": {str(sess.overflow == 0 and finite).lower()}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
