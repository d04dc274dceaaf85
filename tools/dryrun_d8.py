"""Multi-step D=8 virtual-mesh validation at production-like N (config #5).

Runs the production sharded path (shard_verlet + recovery armed) on an
8-device CPU mesh at the largest CPU-feasible N, long enough to cross
many collective rebins and slab migrations, then gates:

* conservation: every particle alive on some slab (alive == n)
* identity: the dense idx planes still hold the permutation 0..n-1,
  and extract_fluid_state returns ORIGINAL-order state
* overflow == dropped == 0; positions finite and inside the bounce box
* cross-slab traffic actually happened (all 8 slabs populated; the flow
  was given a bulk drift so particles cross slab boundaries)

This is the scale half of BASELINE.json config #5 that a 1-chip rig can
execute (the 4M hardware half runs as tools/bench_sharded.py --n 4000000
at D=1); ICI collectives here are XLA:CPU rendezvous, so every step blocks
(1-core deadlock safety, CLAUDE.md).

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_d8.py --n 102400 --steps 150
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=102_400)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    state = bgf.init_grid(side, side, 0.04)
    # bulk drift: the column slides sideways so particles cross slab
    # boundaries (migration + edge merges are the paths under test)
    state = state.replace(vx=jnp.full((n,), 2.0))

    spec = shard.ShardSpec.build(
        h=0.045 * 1.5, x_min=-1.0, x_max=extent + 1.0,
        y_max=extent * 1.1 + 1.0, n_devices=args.devices,
        capacity=-(-n // args.devices) * 4)
    mesh = shard.make_mesh(args.devices)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        params, cfg, spec, mesh, n=n)

    sim = init_fn(shard.shard_state(state, spec))
    t0 = time.time()
    for i in range(args.steps):
        sim = step_fn(sim)
        jax.block_until_ready(sim.xd)   # 1-core rendezvous safety
    wall = time.time() - t0

    alive = int(jnp.sum(sim.alive))
    ovf = int(sim.overflow.max())
    drp = int(sim.dropped.sum())
    rebins = int(sim.rebin_count.max())
    per_dev = [int(jnp.sum(jax.lax.slice_in_dim(
        sim.idx_d, d, d + 1, axis=0) >= 0)) for d in range(args.devices)]

    ids = np.asarray(sim.idx_d).reshape(-1)
    ids = np.sort(ids[ids >= 0])
    id_ok = (ids.shape[0] == n
             and bool((ids == np.arange(n)).all()))

    fs = shard_verlet.extract_fluid_state(sim, spec, params, n)
    x, y = np.asarray(fs.x), np.asarray(fs.y)
    finite = bool(np.isfinite(x).all() and np.isfinite(y).all())
    in_box = bool((x >= cfg.x_min - 1e-5).all()
                  and (x <= cfg.x_max + 1e-5).all()
                  and (y >= -1e-5).all())

    ok = (alive == n and ovf == 0 and drp == 0 and id_ok and finite
          and in_box and rebins >= 3 and min(per_dev) > 0)
    print(json.dumps({
        "metric": f"dryrun_D{args.devices}_steps",
        "n": n, "steps": args.steps, "rebins": rebins,
        "alive": alive, "overflow": ovf, "dropped": drp,
        "identity_exact": id_ok, "finite": finite, "in_box": in_box,
        "per_device_alive": per_dev,
        "wall_s": round(wall, 1), "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
