"""AOT serving cold-start, measured ON THE CHIP (VERDICT r3 item 5).

The claim under test (utils/aot.py): a serving worker that restarts must
re-TRACE every jitted program before the persistent compile cache can even
be consulted — minutes of single-core Python for the large verlet graphs —
while a worker that loads a ``jax.export`` artifact deserializes the
StableHLO and dispatches with ZERO retracing.  This tool measures both
cold-start paths end to end at the flagship scale:

  phase export   build the 1M Session, export ``run(100)`` with
                 ``allow_tpu_custom_calls=True`` + save the resident state
  phase trace    FRESH process: restore state, build the Session (full
                 retrace), first 100-step dispatch completes
  phase load     FRESH process: restore state, ``load_exported``, first
                 100-step dispatch completes

Each phase is its own process (the axon TPU claim is exclusive — phases
must run strictly one at a time), launched sequentially by the
orchestrator, which records the wall clock of the whole subprocess: that
IS the worker cold-start a fleet operator sees.  Both measured phases run
with the same warm persistent compile cache, so the difference is pure
tracing+lowering — exactly what the artifact eliminates.  The artifact's
Mosaic payloads are toolchain-pinned (utils/aot.py caveats); the load
phase also PROVES such an artifact executes on this libtpu.

  python tools/bench_aot.py --n 1000000

(reference analog: none — /root/reference's pipeline cache is in-process
only, src/gpu/pipeline.rs warmup; this is the deployment story it lacks.)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

WORK = "/tmp/bgf_aot"


def _scene(n: int):
    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.models import verlet_solver

    side = int(math.isqrt(n))
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      extent * 1.1 + 1.0, skin_factor=1.75)
    state = bgf.init_grid(side, side, 0.04)
    return state, params, cfg, grid


def _jax():
    import jax
    if os.environ.get("BGF_FORCE_CPU"):     # smoke-test path (axon ignores
        jax.config.update("jax_platforms", "cpu")   # env JAX_PLATFORMS)
        cache = os.path.expanduser("~/.jax_cache_cpu")
    else:
        cache = "/root/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def phase_export(n: int) -> None:
    jax = _jax()
    from bevy_gpu_fluid_tpu.models import verlet_solver
    from bevy_gpu_fluid_tpu.utils import aot

    state, params, cfg, grid = _scene(n)
    t0 = time.perf_counter()
    sess = verlet_solver.Session(state, params, cfg, grid)
    sess.run(100)
    jax.block_until_ready(sess.sim.xd)
    t_ready = time.perf_counter() - t0
    sess.save(f"{WORK}/state.npz")
    t0 = time.perf_counter()
    aot.export_session_run(
        sess, 100, f"{WORK}/run100.bin",
        allow_tpu_custom_calls=jax.default_backend() == "tpu")
    t_export = time.perf_counter() - t0
    art = os.path.getsize(f"{WORK}/run100.bin")
    print(json.dumps({"phase": "export", "build_to_ready_s": t_ready,
                      "export_s": t_export, "artifact_bytes": art}))


def phase_trace(n: int) -> None:
    jax = _jax()
    from bevy_gpu_fluid_tpu.models import verlet_solver

    t0 = time.perf_counter()
    sess = verlet_solver.Session.restore(f"{WORK}/state.npz")
    sess.run(100)
    jax.block_until_ready(sess.sim.xd)
    print(json.dumps({"phase": "trace",
                      "restore_to_first_batch_s": time.perf_counter() - t0,
                      "probe": float(jax.numpy.sum(sess.sim.rho_d))}))


def phase_load(n: int) -> None:
    jax = _jax()
    from bevy_gpu_fluid_tpu.utils import aot, checkpoint

    t0 = time.perf_counter()
    sim, grid, params, cfg, _n = checkpoint.load_dense(f"{WORK}/state.npz")
    run = aot.load_exported(f"{WORK}/run100.bin", out_like=sim)
    sim = run(sim)
    jax.block_until_ready(sim.xd)
    print(json.dumps({"phase": "load",
                      "restore_to_first_batch_s": time.perf_counter() - t0,
                      "probe": float(jax.numpy.sum(sim.rho_d))}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--phase", choices=["export", "trace", "load"])
    args = ap.parse_args()

    if args.phase:                    # child: touch the TPU, do one phase
        sys.path.insert(0, __file__.rsplit("/", 2)[0])
        {"export": phase_export, "trace": phase_trace,
         "load": phase_load}[args.phase](args.n)
        return 0

    # orchestrator: NO jax import here — each phase owns the chip alone
    os.makedirs(WORK, exist_ok=True)
    results = {}
    # load runs twice: the FIRST call XLA-compiles the deserialized
    # StableHLO (cacheable); the second is the steady-state fleet restart
    for key, phase in (("export", "export"), ("trace", "trace"),
                       ("load_cold", "load"), ("load", "load")):
        t0 = time.perf_counter()
        p = subprocess.run([sys.executable, __file__, "--n", str(args.n),
                            "--phase", phase],
                           capture_output=True, text=True, timeout=5400)
        wall = time.perf_counter() - t0
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1] if "{" in p.stdout else "{}"
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise SystemExit(f"phase {key} failed rc={p.returncode}")
        results[key] = json.loads(line)
        results[key]["process_wall_s"] = wall
        print(f"# {key}: {results[key]}", file=sys.stderr)

    # the two cold starts did the same work from the same snapshot; the
    # exported program's HLO context differs from the in-process jit's
    # (flattened args), so allow f32 reassociation noise on the probe sum
    pt, pl_ = results["trace"]["probe"], results["load"]["probe"]
    assert abs(pt - pl_) <= 1e-5 * max(abs(pt), 1.0), results
    speedup = (results["trace"]["process_wall_s"]
               / results["load"]["process_wall_s"])
    print(json.dumps({
        "metric": "aot_cold_start",
        "n": args.n,
        "trace_cold_start_s": round(results["trace"]["process_wall_s"], 1),
        "aot_cold_start_s": round(results["load"]["process_wall_s"], 1),
        "aot_first_ever_s": round(results["load_cold"]["process_wall_s"], 1),
        "speedup": round(speedup, 2),
        "artifact_mb": round(results["export"]["artifact_bytes"] / 2**20, 1),
        "first_build_s": round(results["export"]["build_to_ready_s"], 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
