"""Throughput benchmark: particle-steps/s/chip on the flagship solver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config is BASELINE.json config #4: 1M particles, full fused step
(binning + density + pressure + forces + integrate + boundaries), dynamic
scene.  ``vs_baseline`` is value / 10e6 — the north-star bar of >=10M
particle-steps/s/chip (BASELINE.json); >=1.0 means target met.  For scale:
the reference's own headline was ~1.9M particle-steps/s end-to-end
(10,000 particles at 188 FPS, reference: README.md:81-86) — and unlike this
bench, its harness never integrated the scene (examples/bench_gpu.rs runs
with UseGpuIntegration(false), re-uploading a static scene every frame).

Run with no args on the TPU host; use --n / --steps / --case to vary.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import grid_solver, pallas_solver, verlet_solver

NORTH_STAR = 10_000_000.0  # particle-steps/s/chip, BASELINE.json


def bench_case(n_particles: int, n_steps: int, cap: int = 8,
               verbose: bool = False, solver: str = "verlet",
               warmup_steps: int = 300, skin: float = 1.5) -> dict:
    """Time a fully dynamic dam-break run on the chosen solver.

    The scene is advanced ``warmup_steps`` first (untimed) so the timed
    window sees developed flow — rebin-amortizing solvers would otherwise
    flatter themselves on the near-static opening frames.  (The reference's
    own bench never integrated at all: examples/bench_gpu.rs re-uploads a
    static scene with UseGpuIntegration(false).)

    Timing is DIFFERENTIAL: one n_steps dispatch and one 2*n_steps dispatch
    are both run from the same post-warmup snapshot (immutable pytree) and
    the difference is reported — per-dispatch overhead (this rig's ~20-27 ms
    tunnel round-trip) appears identically in both and cancels, leaving the
    pure steady-state per-step cost of the steps-[w+n, w+2n] window.  The
    long run must stay inside the scene's overflow-0 regime, which the
    default 300+300/600 horizon (step 900) does; see --steps help."""
    side = int(math.isqrt(n_particles))
    n = side * side
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    # box fitted to the block with splash margin on all sides
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)

    # DIFFERENTIAL WINDOW: time one (n_steps)-dispatch and one
    # (2*n_steps)-dispatch from the SAME post-warmup snapshot and subtract.
    # Both runs carry identical per-dispatch overhead (this rig's ~20-27 ms
    # tunnel round-trip + host sync), so the difference isolates the pure
    # per-step cost of the LAST n_steps of the long run — the same
    # steps-[warmup+n, warmup+2n] physics window the inclusive measurement
    # covered, now with the rig artifact cancelled instead of amortized.
    # (On production hardware, dispatch is sub-ms and the two readings
    # converge; the implied dispatch overhead is printed for honesty.)
    if solver == "verlet":
        # production shape: persistent dense Session (state stays resident
        # between calls; no per-call re-binning or extraction)
        grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                          y_max=extent * 1.1 + 1.0, cap=cap,
                                          skin_factor=skin)
        sess = verlet_solver.Session(state, params, cfg, grid)

        def run_block(k):
            sess.run(k)
            jax.block_until_ready(sess.sim.xd)

        t0 = time.time()
        run_block(warmup_steps)
        snap = sess.sim           # immutable pytree: the step-warmup state
        run_block(n_steps)        # compile the short shape
        sess.sim = snap
        run_block(2 * n_steps)    # compile the long shape
        t_compile = time.time() - t0

        t_short = t_long = float("inf")
        for _ in range(3):        # best-of-3 each: the diff doubles jitter
            sess.sim = snap
            t0 = time.time()
            run_block(n_steps)
            t_short = min(t_short, time.time() - t0)
            rebins_short = int(sess.sim.rebin_count)
            sess.sim = snap
            t0 = time.time()
            run_block(2 * n_steps)
            t_long = min(t_long, time.time() - t0)
        # counters restore with the snapshot, so long-run minus short-run
        # totals = the timed window's own rebins
        rebins = int(sess.sim.rebin_count) - rebins_short
        overflow = sess.overflow  # whole warmup+2n horizon of the long run
        finite = bool(jnp.isfinite(sess.sim.xd).all())
    else:
        grid = grid_solver.default_grid(0.045, -1.0, extent + 1.0,
                                        y_max=extent * 1.1 + 1.0, cap=cap)
        run = jax.jit(lambda s, k: pallas_solver.multi_step(
            s, params, cfg, grid, k), static_argnums=1)

        t0 = time.time()
        snap, diag = jax.block_until_ready(run(state, warmup_steps))
        s, diag = jax.block_until_ready(run(snap, n_steps))
        s, diag = jax.block_until_ready(run(snap, 2 * n_steps))
        t_compile = time.time() - t0
        t_short = t_long = float("inf")
        for _ in range(3):
            t0 = time.time()
            s, diag = jax.block_until_ready(run(snap, n_steps))
            t_short = min(t_short, time.time() - t0)
            t0 = time.time()
            s, diag = jax.block_until_ready(run(snap, 2 * n_steps))
            t_long = min(t_long, time.time() - t0)
        overflow = int(diag.overflow)
        rebins = n_steps   # eager: every step of the timed window
        finite = bool(jnp.isfinite(s.x).all())

    dt = t_long - t_short
    rate = n * n_steps / dt
    if verbose:
        print(f"# n={n} solver={solver} steps={n_steps} "
              f"(window [{warmup_steps + n_steps}, {warmup_steps + 2 * n_steps}]) "
              f"compile+warmup={t_compile:.1f}s "
              f"short={t_short:.3f}s long={t_long:.3f}s "
              f"diff={dt:.3f}s ({dt / n_steps * 1e3:.3f} ms/step; "
              f"inclusive {t_short / n_steps * 1e3:.3f}) "
              f"dispatch~{(2 * t_short - t_long) * 1e3:.1f}ms "
              f"rebins={rebins} overflow={overflow} "
              f"finite={finite}", file=sys.stderr)
    return {"n": n, "steps": n_steps, "seconds": dt, "rate": rate,
            "ms_per_step": dt / n_steps * 1e3, "overflow": overflow}


def bench_fps(plan=(10_000, 5_041, 1_024), seconds: float = 3.0,
              substeps: int = 16) -> None:
    """The reference's FPS table (examples/bench_gpu.rs:36): ~3 s per case,
    average frame rate to stderr.  Each frame = ``substeps`` sim steps (at
    dt=5e-4, 16 substeps per 60 Hz frame is real-time) + an on-device raster.
    Unlike the reference harness, every frame here really integrates the
    scene.  The engine is the RESIDENT verlet facade (Simulation holds a
    dense Session — no per-frame re-binning or extraction); frames are
    measured in both raster modes: 'density' per-particle splats (the
    reference's sprite analog, 512-wide) and 'field' (the scalable
    grid-aligned density-field raster — the production render).  Reported
    twice each: frames fully materialized on-device, and frames pulled to
    host.  All loops are PIPELINED through render.pump.FramePump (one
    frame/batch in flight): the ~27 ms tunnel dispatch round-trip and the
    host transfer overlap the next frame's compute instead of serializing
    with it — every counted frame is still fully materialized (host np
    bytes / block_until_ready), one frame late."""
    import numpy as np
    from bevy_gpu_fluid_tpu import Simulation
    from bevy_gpu_fluid_tpu.models import verlet_solver
    from bevy_gpu_fluid_tpu.render.pump import FramePump
    for n in plan:
        side = int(math.isqrt(n))
        extent = side * 0.04
        state = bgf.init_grid(side, side, 0.04)
        cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
        grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                          y_max=extent * 1.1 + 1.0, cap=8)
        sim = Simulation(state, bgf.FluidParams.demo(), cfg, grid,
                         solver="verlet", raster_width=512,
                         y_view_max=extent * 1.1 + 1.0)

        def loop(pull: bool, mode: str) -> float:
            jax.block_until_ready(sim.run_frame(substeps, mode))  # compile
            pump = FramePump(pull=pull)
            frames = 0
            t0 = time.time()
            while time.time() - t0 < seconds:
                if pump.push(sim.run_frame(substeps, mode)) is not None:
                    frames += 1
            if pump.flush() is not None:
                frames += 1
            return frames / (time.time() - t0)

        def loop_batched(pull: bool, mode: str, f: int = 32) -> float:
            """Throughput mode: f frames per dispatch (Simulation.run_frames
            — same frame bytes, stacked), pipelined one BATCH in flight.
            The ~27 ms tunnel dispatch + host-pull latencies amortize over
            f frames instead of taxing each one."""
            jax.block_until_ready(sim.run_frames(f, substeps, mode))
            pump = FramePump(pull=pull)
            frames = 0
            t0 = time.time()
            while time.time() - t0 < seconds:
                if pump.push(sim.run_frames(f, substeps, mode)) is not None:
                    frames += f
            if pump.flush() is not None:
                frames += f
            return frames / (time.time() - t0)

        dev, host = loop(False, "density"), loop(True, "density")
        bdev, bhost = loop_batched(False, "density"), \
            loop_batched(True, "density")
        fdev, fhost = loop_batched(False, "field"), \
            loop_batched(True, "field")
        print(f"# fps: {sim.state.n} particles x {substeps} substeps/frame "
              f"(resident Session engine) -> splat per-frame {dev:.1f} "
              f"on-device / {host:.1f} incl. pull; splat batched x32: "
              f"{bdev:.1f} / {bhost:.1f}; field batched x32: {fdev:.1f} / "
              f"{fhost:.1f} "
              f"(reference GPU bridge, no integration: 188.0 @10k / "
              f"191.3 @5k / 202.8 @1k)", file=sys.stderr)


def bench_frames(n: int = 1_000_000, seconds: float = 10.0,
                 substeps: int = 16, skin: float = 1.75) -> None:
    """BASELINE config #4: 1M sim + on-TPU density-field raster streaming,
    on the persistent dense Session (state never leaves the device; one
    dispatch per frame)."""
    import math as _m
    side = int(_m.isqrt(n))
    state = bgf.init_grid(side, side, 0.04)
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8,
                                      skin_factor=skin)
    sess = verlet_solver.Session(state, bgf.FluidParams.demo(), cfg, grid)
    img = jax.block_until_ready(sess.run_frame(substeps))   # compile
    from bevy_gpu_fluid_tpu.render.pump import FramePump
    pump = FramePump(pull=False)   # on-device streaming, pipelined
    frames = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        if pump.push(sess.run_frame(substeps)) is not None:
            frames += 1
    if pump.flush() is not None:
        frames += 1
    dt = time.time() - t0
    fps = frames / dt
    rate = sess.n * substeps * fps
    print(f"# config4: {sess.n} particles x {substeps} substeps + "
          f"{img.shape[0]}x{img.shape[1]} on-TPU field raster/frame -> "
          f"{dt / frames * 1e3:.1f} ms/frame ({fps:.1f} FPS), "
          f"{rate / 1e6:.1f}M particle-steps/s incl. rendering, "
          f"overflow={sess.overflow}", file=sys.stderr)


def bench_golden_step(side: int = 70) -> None:
    """The reference's criterion bench (benches/step_benches.rs: step_4.9k,
    70x70 CPU step at 1.87 ms/step): golden-model step latency."""
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create()
    from bevy_gpu_fluid_tpu.models import reference as golden
    stepf = jax.jit(lambda s: golden.multi_step(s, params, cfg, 10))
    jax.block_until_ready(stepf(state))
    t0 = time.time()
    s = jax.block_until_ready(stepf(state))
    dt = (time.time() - t0) / 10
    print(f"# golden step: {state.n} particles {dt * 1e3:.3f} ms/step "
          f"(reference CPU: 1.87 ms/step at 4.9k)", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=300,
                    help="timed window length; the run is differential "
                         "(2*steps-dispatch minus steps-dispatch), so the "
                         "scene must stay valid to warmup+2*steps.  The "
                         "default 300 puts the measured window at steps "
                         "600-900, inside the overflow-0 regime; horizons "
                         "past ~1100 reach the compressed phase (rebin "
                         "cadence 1/4.3, overflow>0) and are SLOWER per "
                         "step — the scene, not the solver")
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--solver", choices=["verlet", "pallas"],
                    default="verlet")
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--skin", type=float, default=1.75,
                    help="verlet skin factor (cell = skin*h); 1.75 is the "
                         "measured optimum for the dam-break scenes with "
                         "cap=8 (2.0 overflows capacity in compressed flow)")
    ap.add_argument("--sweep", action="store_true",
                    help="also run 10k/100k cases (reported to stderr)")
    ap.add_argument("--fps", action="store_true",
                    help="also run the reference's 3-case FPS table")
    ap.add_argument("--frames", action="store_true",
                    help="also run BASELINE config #4 (1M sim+render "
                         "streaming on the persistent Session)")
    ap.add_argument("--frames-skin", type=float, default=1.5,
                    help="skin for the --frames case (default 1.5: the "
                         "streaming window is 2000+ steps, where 1.75 "
                         "accumulates capacity overflow in the deep-column "
                         "scene)")
    ap.add_argument("--golden", action="store_true",
                    help="also run the golden-model step-latency bench")
    args = ap.parse_args()

    if args.golden:
        bench_golden_step()
    if args.fps:
        bench_fps()
    if args.frames:
        bench_frames(skin=args.frames_skin)
    if args.sweep:
        for n in (10_000, 100_000):
            bench_case(n, args.steps, cap=args.cap, verbose=True,
                       solver=args.solver, warmup_steps=args.warmup_steps,
                       skin=args.skin)

    r = bench_case(args.n, args.steps, cap=args.cap, verbose=True,
                   solver=args.solver, warmup_steps=args.warmup_steps,
                   skin=args.skin)
    print(json.dumps({
        "metric": f"particle_steps_per_sec_per_chip_{args.n // 1000}k",
        "value": round(r["rate"], 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(r["rate"] / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
