"""Width-vs-size discriminator for the >96M device fault.

112M and 128M scale runs fault with a runtime TPU device error even
single-buffered, after warmup succeeds (tools/bench_scale.py).  Two
hypotheses: (a) a kernel/DMA bug past nx_pad 5120 lanes, (b) HBM
pressure at ~8 GiB resident.  This probe separates them: a WIDE,
SHALLOW scene reproduces the 128M grid's nx_pad (~5888 lanes) with
only ~1M particles (~170 MB resident), runs the same step count as the
faulting window, and rebins repeatedly.  Fault here => width bug;
clean here => size/HBM.

  python tools/probe_width.py --cols 11600 --rows 87
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--cols", type=int, default=11600)
    ap.add_argument("--rows", type=int, default=87)
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--block", type=int, default=300)
    ap.add_argument("--skin", type=float, default=1.75)
    args = ap.parse_args()

    n = args.cols * args.rows
    extent = args.cols * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=args.rows * 0.04 * 1.1 + 1.0,
                                      skin_factor=args.skin)
    gib = 8 * grid.ny_pad * grid.cap * grid.nx_pad * 4 / 2**30
    print(f"# n={n} grid {grid.ny_pad}x{grid.cap}x{grid.nx_pad} "
          f"(~{gib:.2f} GiB resident dense)", file=sys.stderr)

    state = bgf.init_grid(args.cols, args.rows, 0.04)
    sess = verlet_solver.Session(state, params, cfg, grid)
    jax.block_until_ready(sess.sim.xd)
    done = 0
    while done < args.steps:
        k = min(args.block, args.steps - done)
        t0 = time.time()
        sess.run(k)
        jax.block_until_ready(sess.sim.xd)
        done += k
        print(f"# steps {done}: {(time.time() - t0) / k * 1e3:.2f} ms/step "
              f"rebins={int(sess.sim.rebin_count)} overflow={sess.overflow}",
              file=sys.stderr)
    finite = bool(jnp.isfinite(sess.sim.xd[sess.sim.xd < 1e8]).all())
    print(f'{{"metric": "probe_width_nx{grid.nx_pad}", "value": {done}, '
          f'"unit": "steps", '
          f'"ok": {str(sess.overflow == 0 and finite).lower()}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
