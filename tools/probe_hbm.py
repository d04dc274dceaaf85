"""Compile-only HBM accounting for the very-large-N programs.

AOT-lowers the HBM-wall posture's programs (segmented ``step_until``,
``rebin_one``) — and optionally the standard ``run_k`` scan — at a given N
WITHOUT allocating any state (shapes come from ``jax.eval_shape`` on the
init), then prints XLA's ``memory_analysis`` per program: argument /
output / temp / alias bytes.  This is how a RESOURCE_EXHAUSTED at the
ceiling is attributed to a specific program and a specific temp budget
instead of guessed at (the 160M fault: bench_scale's first segmented
dispatch).

  python tools/probe_hbm.py --n 160000000
"""

from __future__ import annotations

import argparse
import math
import sys
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import verlet_solver


def _report(name: str, compiled) -> None:
    m = compiled.memory_analysis()
    if m is None:   # some CPU/plugin backends don't implement it
        print(f"{name}: memory_analysis unavailable on this backend",
              flush=True)
        return
    gib = 2**30
    print(f"{name}:")
    print(f"  argument {m.argument_size_in_bytes / gib:.2f} GiB  "
          f"output {m.output_size_in_bytes / gib:.2f} GiB  "
          f"alias {m.alias_size_in_bytes / gib:.2f} GiB  "
          f"TEMP {m.temp_size_in_bytes / gib:.2f} GiB")
    live = (m.argument_size_in_bytes + m.output_size_in_bytes
            + m.temp_size_in_bytes - m.alias_size_in_bytes)
    print(f"  peak live (arg+out+temp-alias) ~ {live / gib:.2f} GiB",
          flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160_000_000)
    ap.add_argument("--skin", type=float, default=1.75)
    ap.add_argument("--standard", action="store_true",
                    help="also compile the standard run_k scan program")
    ap.add_argument("--no-recovery", action="store_true",
                    help="compile with recovery=False (isolates the spill "
                    "collect/admit machinery's share of the rebin temps)")
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0,
                                      skin_factor=args.skin)
    plane = grid.ny_pad * grid.cap * grid.nx_pad * 4 / 2**30
    print(f"# n={n} grid {grid.ny_pad}x{grid.cap}x{grid.nx_pad} "
          f"plane={plane:.2f} GiB resident(8)={8 * plane:.2f} GiB",
          flush=True)

    sess = verlet_solver.Session.__new__(verlet_solver.Session)
    sess._setup(params, cfg, grid, n, None, 64, None,
                donate=True, recovery=not args.no_recovery)
    print(f"# posture: segmented={sess.segmented} "
          f"planar_rebin={sess.planar_rebin} "
          f"refless={sess.refless_trigger}", flush=True)

    sim_shapes = jax.eval_shape(
        partial(verlet_solver.init_dense_gen, bgf.lattice_gen(side, 0.04),
                n, grid=grid, n_chunks=16,
                spill_cap=verlet_solver.SPILL_CAP, collect_spill=True))
    if sess.refless_trigger:
        # mirror Session._apply_refless: the resident sim carries (1,1,1)
        # ref placeholders, NOT plane-sized refs — probing with the init's
        # raw shapes would re-count the 2 plane-footprints the posture
        # sheds (this exact mistake hid the refless win on first probe)
        import dataclasses as _dc
        ph = jax.ShapeDtypeStruct((1, 1, 1), jnp.float32)
        sim_shapes = _dc.replace(sim_shapes, ref_xd=ph, ref_yd=ph)

    step_until, rebin_one, rotated = sess._segmented_build()
    k_shape = jax.ShapeDtypeStruct((), jnp.int32)
    _report("step_until (segmented while_loop, donated)",
            step_until.lower(sim_shapes, k_shape).compile())
    if rotated:
        s = sim_shapes
        rest = (s.occ, s.disp2, s.age, s.overflow, s.lost, s.rebin_count,
                s.step, s.sx, s.sy, s.svx, s.svy, s.sidx, s.readmitted)
        _report("rebin_one (planar rebin, donor-chain rotated)",
                rebin_one.lower(s.rho_d, s.xd, s.yd, s.vxd, s.vyd,
                                s.idx_d, rest).compile())
    else:
        _report("rebin_one (planar rebin, donated)",
                rebin_one.lower(sim_shapes).compile())
    if args.standard:
        _report("run_k(150) (standard scan w/ rebin cond, donated)",
                sess._run_k.lower(sim_shapes, 150).compile())
    return 0


if __name__ == "__main__":
    sys.exit(main())
