"""A/B the MONO kernel (one launch/step) vs the two-kernel step at small N
on the chip, to place pallas_solver._MONO_MAX_BLOCKS with data.

Differential timed window like bench.py (300- vs 600-step dispatch from one
snapshot, subtracted).  Usage:

    python tools/bench_mono_ab.py <n_particles> <mono01>

Run pairs (mono=1 / mono=0) at several n and pick the crossover in
grid.n_row_blocks; see the threshold comment at
bevy_gpu_fluid_tpu/models/pallas_solver.py (_MONO_MAX_BLOCKS).
"""
import math
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver


def main() -> None:
    n_target = int(sys.argv[1])
    mono = bool(int(sys.argv[2]))
    pallas_solver._MONO_MAX_BLOCKS = 10_000 if mono else 0
    side = int(math.isqrt(n_target))
    n = side * side
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(
        0.045, -1.0, extent + 1.0, y_max=extent * 1.1 + 1.0, cap=8,
        skin_factor=1.75 if n >= 250_000 else 1.5)
    sess = verlet_solver.Session(state, params, cfg, grid)

    def run_block(k):
        sess.run(k)
        jax.block_until_ready(sess.sim.xd)

    run_block(300)                    # develop the flow
    snap = sess.sim
    run_block(300)                    # compile short
    sess.sim = snap
    run_block(600)                    # compile long
    bs = bl = float("inf")
    for _ in range(3):
        sess.sim = snap
        t0 = time.time()
        run_block(300)
        bs = min(bs, time.time() - t0)
        sess.sim = snap
        t0 = time.time()
        run_block(600)
        bl = min(bl, time.time() - t0)
    d = bl - bs
    print(f"mono={int(mono)} n={n} nb={grid.n_row_blocks} "
          f"per_step={d / 300 * 1e3:.3f}ms rate={n * 300 / d / 1e6:.1f}M "
          f"overflow={sess.overflow}")


if __name__ == "__main__":
    main()
