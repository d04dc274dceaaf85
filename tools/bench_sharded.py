"""Hardware benchmark of the multi-chip production path (shard_verlet).

Runs the sharded deferred-rebinning solver (shard_map slab decomposition +
ppermute halos + Pallas stencils) over a real device mesh and reports
particle-steps/s with conservation/overflow checks.  On this rig only one
v5e chip is reachable, so the default is a D=1 mesh — the full collective
code path (halo exchanges, psum'd rebin trigger, migration machinery)
compiled and executed on hardware; ICI scaling itself is validated on the
virtual CPU mesh (tests/test_shard*.py, __graft_entry__.dryrun_multichip).

  python tools/bench_sharded.py --n 1000000 --steps 100
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
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--skin", type=float, default=1.75)
    ap.add_argument("--frames", action="store_true",
                    help="also time the sharded step+render loop "
                         "(parallel/shard_render.py strips, 16 substeps + "
                         "one on-device frame per iteration)")
    ap.add_argument("--frames-skin", type=float, default=1.5,
                    help="skin for the --frames phase (default 1.5, like "
                         "bench.py --frames: the streaming window runs "
                         "1500+ steps of the deep-column scene, where 1.75 "
                         "brushes capacity overflow)")
    ap.add_argument("--scale", action="store_true",
                    help="very-large-per-device-N mode (the sharded twin "
                    "of tools/bench_scale.py): ShardedSession with the HBM "
                    "posture knobs — chunked init, donation, planar rebin "
                    "— and INCLUSIVE best-of-reps timing (the differential "
                    "window's snapshot keeps two copies of the dense "
                    "planes alive, unaffordable at the ceiling)")
    ap.add_argument("--chunks", type=int, default=16,
                    help="[--scale] init_chunks for the chunked init")
    ap.add_argument("--planar", choices=["auto", "on", "off"],
                    default="auto", help="[--scale] planar rebin override")
    ap.add_argument("--chunk", type=int, default=0,
                    help="[--scale] split dispatches into K-step chunks "
                    "(tunneled-rig RPC-deadline mitigation, like "
                    "Session.run(chunk=))")
    ap.add_argument("--refless", choices=["auto", "on", "off"],
                    default="auto",
                    help="[--scale] refless-trigger override (auto = "
                    "ShardedSession's per-device grid threshold)")
    ap.add_argument("--gen", action="store_true",
                    help="[--scale] generator init "
                    "(ShardedSession.from_generator): the lattice is "
                    "computed chunk-by-chunk per device — no [N] "
                    "FluidState or [D, capacity] ShardedState on device "
                    "(required past ~96M/device, where those init inputs "
                    "coexisting with the dense planes OOM)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--capacity-factor", type=float, default=2.0,
                    help="per-device particle-buffer size as a multiple of "
                    "n/D (default 2.0; at D=1 nothing can migrate in, so "
                    "1.0 sheds ~4 [n] planes of HBM at the ceiling)")
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    spec = shard.ShardSpec.build(
        h=0.045 * args.skin, x_min=-1.0, x_max=extent + 1.0,
        y_max=extent * 1.1 + 1.0, n_devices=args.devices,
        capacity=int(-(-n // args.devices) * args.capacity_factor))
    mesh = shard.make_mesh(args.devices)

    if args.scale:
        return scale_mode(args, n, side, params, cfg, spec, mesh)
    # the fused hardware path: Pallas density + fused forces+integrate,
    # with overflow recovery armed (n=) — the full production shape
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        params, cfg, spec, mesh, fused=True, n=n)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_k(sim, k):
        # step_fn is itself jitted; inlined under this scan
        def body(s, _):
            return step_fn(s), None
        return jax.lax.scan(body, sim, None, length=k)[0]

    state = bgf.init_grid(side, side, 0.04)
    sim = init_fn(shard.shard_state(state, spec))

    # differential window, like bench.py: a steps- and a 2*steps-dispatch
    # from the same post-warmup snapshot, subtracted — per-dispatch tunnel
    # overhead (~20-27 ms on this rig) cancels
    t0 = time.time()
    snap = jax.block_until_ready(run_k(sim, args.warmup_steps))
    sim = jax.block_until_ready(run_k(snap, args.steps))
    sim = jax.block_until_ready(run_k(snap, 2 * args.steps))
    t_compile = time.time() - t0
    t_short = t_long = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run_k(snap, args.steps))
        t_short = min(t_short, time.time() - t0)
        t0 = time.time()
        sim = jax.block_until_ready(run_k(snap, 2 * args.steps))
        t_long = min(t_long, time.time() - t0)
    dt = t_long - t_short

    alive = int(jnp.sum(sim.alive))
    ovf = int(sim.overflow.max())
    drp = int(sim.dropped.sum())
    rate = n * args.steps / dt
    # hardware identity check: the dense idx planes must still hold the
    # permutation 0..n-1 after the full benchmark run's rebins
    import numpy as np
    ids = np.asarray(sim.idx_d).reshape(-1)
    ids = np.sort(ids[ids >= 0])
    id_ok = ids.shape[0] == alive and bool(
        (ids == np.arange(ids.shape[0])).all()) and alive == n
    print(f"# sharded-verlet D={args.devices} n={n} "
          f"compile+warmup={t_compile:.1f}s "
          f"{dt / args.steps * 1e3:.2f} ms/step = {rate / 1e6:.1f}M "
          f"particle-steps/s (differential; inclusive "
          f"{t_short / args.steps * 1e3:.2f} ms/step, dispatch~"
          f"{(2 * t_short - t_long) * 1e3:.1f}ms) | alive {alive}/{n} "
          f"overflow={ovf} dropped={drp} rebins={int(sim.rebin_count.max())} "
          f"identity={'exact' if id_ok else 'BROKEN'}",
          file=sys.stderr)
    ok = alive == n and ovf == 0 and drp == 0 and id_ok

    if args.frames:
        from bevy_gpu_fluid_tpu.parallel import shard_render

        # fresh sim on its own (shallower-skin) grid for the frames window:
        # the streaming loop runs 1500+ total steps of this tall-column
        # scene, where skin 1.75 brushes capacity overflow (documented
        # scene regime, CLAUDE.md) — same split as bench.py --frames-skin
        fspec = shard.ShardSpec.build(
            h=0.045 * args.frames_skin, x_min=-1.0, x_max=extent + 1.0,
            y_max=extent * 1.1 + 1.0, n_devices=args.devices,
            capacity=-(-n // args.devices) * 2)
        finit_fn, fstep_fn = shard_verlet.make_sharded_verlet_step(
            params, cfg, fspec, mesh, fused=True, n=n)
        frame_fn = shard_render.make_sharded_frame(params, fspec, mesh)

        @jax.jit
        def frame_step(s):
            def body(st, _):
                return fstep_fn(st), None
            s = jax.lax.scan(body, s, None, length=16)[0]
            return s, frame_fn(s)

        sim_f = finit_fn(shard.shard_state(state, fspec))
        for _ in range(max(1, args.warmup_steps // 16)):    # >=1: compiles
            sim_f, img = frame_step(sim_f)
        jax.block_until_ready(img)                          # compile+warm
        frames = 0
        t0 = time.time()
        while time.time() - t0 < 5.0:
            sim_f, img = frame_step(sim_f)
            jax.block_until_ready(img)
            frames += 1
        fdt = (time.time() - t0) / frames
        frate = n * 16 / fdt
        print(f"# sharded step+render D={args.devices}: "
              f"{fdt * 1e3:.1f} ms/frame ({1 / fdt:.1f} FPS) at "
              f"{img.shape[0]}x{img.shape[1]} = {frate / 1e6:.1f}M "
              f"particle-steps/s incl. rendering, overflow="
              f"{int(sim_f.overflow.max())}", file=sys.stderr)

    print(f'{{"metric": "sharded_verlet_psteps_per_sec_D{args.devices}", '
          f'"value": {rate:.1f}, "unit": "particle-steps/s", '
          f'"ok": {str(ok).lower()}}}')
    return 0 if ok else 1


def scale_mode(args, n, side, params, cfg, spec, mesh) -> int:
    """HBM-ceiling sharded run: ShardedSession(planar_rebin, init_chunks,
    donate) + run(chunk=), inclusive best-of-reps — mirrors
    tools/bench_scale.py for the sharded path (VERDICT r4 #3: a D=1
    hardware run at >=96M particles per device through rebins)."""
    from bevy_gpu_fluid_tpu.parallel.sharded_session import ShardedSession

    g = spec.local_grid
    print(f"# scale mode: D={args.devices} n={n} local grid "
          f"{g.ny_pad}x{g.cap}x{g.nx_pad} "
          f"(~{8 * g.ny_pad * g.cap * g.nx_pad * 4 / 2**30:.1f} GiB "
          f"resident dense/device, capacity={spec.capacity})",
          file=sys.stderr, flush=True)
    planar = {"auto": None, "on": True, "off": False}[args.planar]
    refless = {"auto": None, "on": True, "off": False}[args.refless]
    t0 = time.time()
    if args.gen:
        sess = ShardedSession.from_generator(
            bgf.lattice_gen(side, 0.04), n, params, cfg, spec,
            planar_rebin=planar, init_chunks=args.chunks, donate=True,
            refless_trigger=refless)
    else:
        state = bgf.init_grid(side, side, 0.04)
        t0 = time.time()
        sess = ShardedSession(state, params, cfg, spec, planar_rebin=planar,
                              init_chunks=args.chunks, donate=True,
                              refless_trigger=refless)
        del state
    jax.block_until_ready(sess.sim.xd)
    t_init = time.time() - t0
    ck = args.chunk or None

    t0 = time.time()
    if args.warmup_steps:
        sess.run(args.warmup_steps, chunk=ck)
        jax.block_until_ready(sess.sim.xd)
    t_warm = time.time() - t0

    # per-chunk timing: the FIRST chunk of the first rep carries the
    # run_k compile (minutes at these shapes on a cold cache), which a
    # whole-run average silently folds in — one such read was briefly
    # misdiagnosed as a 5x sharded perf regression before the identical
    # program cache-hit from another tree exposed the artifact.  steady =
    # best chunk; the inclusive average is still reported.
    best = float("inf")
    steady = float("inf")
    kk = ck or args.steps
    for _ in range(args.reps):
        t0 = time.time()
        done = 0
        while done < args.steps:
            c = min(kk, args.steps - done)
            tc = time.time()
            sess.run(c)
            jax.block_until_ready(sess.sim.xd)
            dt = time.time() - tc
            print(f"#   chunk {done}+{c}: {dt / c * 1e3:.1f} ms/step",
                  file=sys.stderr, flush=True)
            steady = min(steady, dt / c)
            done += c
        best = min(best, time.time() - t0)
    ms = best / args.steps * 1e3
    rate = n / steady

    alive = sum(sess.alive)
    ovf, drp = sess.overflow, sess.dropped

    # identity, checked ON DEVICE (a host pull of the idx planes at 96M is
    # a multi-minute 20 MB/s transfer): the live ids must be exactly the
    # permutation 0..n-1 — occurrence counts via one scatter-add.  ONE
    # fused jit program: the eager op-by-op form materializes several
    # [total]-sized temps next to the resident planes (the 128M run
    # finished its 600 steps and then RESOURCE_EXHAUSTED in this check)
    @jax.jit
    def _diag(idx_d, xd):
        ids = idx_d.reshape(-1)
        cnt = jnp.zeros((n,), jnp.int32).at[
            jnp.where(ids >= 0, ids, n)].add(1, mode="drop")
        fin = jnp.isfinite(jnp.where(xd < 1e8, xd, 0.0)).all()
        return jnp.max(cnt), jnp.sum(cnt), fin

    mx, sm, fin = _diag(sess.sim.idx_d, sess.sim.xd)
    id_ok = bool(mx == 1) and int(sm) == alive
    finite = bool(fin)
    ok = alive == n and ovf == 0 and drp == 0 and id_ok and finite
    print(f"# sharded-scale D={args.devices} n={n} init={t_init:.1f}s "
          f"warmup={t_warm:.1f}s {steady * 1e3:.1f} ms/step steady "
          f"(avg incl. compile {ms:.1f}) = {rate / 1e6:.1f}M "
          f"particle-steps/s | alive {alive}/{n} "
          f"overflow={ovf} dropped={drp} suspended={sess.suspended} "
          f"rebins={sess.rebin_count} "
          f"rebin_mode={'planar' if sess.planar_rebin else 'fused'} "
          f"refless={sess.refless_trigger} "
          f"identity={'exact' if id_ok else 'BROKEN'} finite={finite}",
          file=sys.stderr)
    print(f'{{"metric": "sharded_scale_psteps_per_sec_'
          f'{n // 1_000_000}M_D{args.devices}", '
          f'"value": {rate:.1f}, "unit": "particle-steps/s", '
          f'"ok": {str(ok).lower()}}}')
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
