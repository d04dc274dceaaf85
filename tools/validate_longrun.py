"""Long-horizon and resident-checkpoint validation on the real chip.

Two stability/correctness claims the CI suite can't cheaply cover are
re-validated here after kernel changes (run on the TPU host):

* ``--pool``: the 25-row 102,400-particle pool (dissipative walls) must
  run 20,000 steps with overflow 0, finite state, and settle (max |v|
  well below 1) — the validated long-horizon regime documented in
  CLAUDE.md.  Round-3 fused kernels: 41 s wall, settles to 0.140.
* ``--restore``: a 100k ``Session`` saved mid-run and restored must
  continue BITWISE identically to the uninterrupted run (every DenseSim
  leaf equal, rebin counters included).

  python tools/validate_longrun.py --pool --restore
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import verlet_solver


def pool_20k() -> bool:
    rows, cols = 25, 4096          # 102,400 particles, 1 unit deep
    state = bgf.init_grid(cols, rows, 0.04)
    params = bgf.FluidParams.demo()
    width = cols * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-0.5, x_max=width + 0.5,
                                     bounce=-0.5)
    grid = verlet_solver.default_grid(0.045, -0.5, width + 0.5,
                                      y_max=rows * 0.04 * 3 + 0.5, cap=8)
    sess = verlet_solver.Session(state, params, cfg, grid)
    t0 = time.time()
    for k in range(20):
        sess.run(1000)
        jax.block_until_ready(sess.sim.xd)
        if sess.overflow:
            print(f"pool: OVERFLOW {sess.overflow} at step {(k + 1) * 1000}")
            return False
    wall = time.time() - t0
    s = sess.state()
    vmax = float(jnp.max(jnp.sqrt(s.vx ** 2 + s.vy ** 2)))
    ok = (sess.overflow == 0 and bool(jnp.isfinite(s.x).all())
          and vmax < 1.0)
    print(f"pool 102k x 20k steps: overflow={sess.overflow} "
          f"finite={bool(jnp.isfinite(s.x).all())} max|v|={vmax:.3f} "
          f"rebins={int(sess.sim.rebin_count)} wall={wall:.0f}s "
          f"-> {'OK' if ok else 'FAIL'}")
    return ok


def restore_100k() -> bool:
    side = 316   # 99,856 particles
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8,
                                      skin_factor=1.75)
    a = verlet_solver.Session(state, params, cfg, grid)
    a.run(500)
    a.save("/tmp/validate_sess100k")
    a.run(500)
    b = verlet_solver.Session.restore("/tmp/validate_sess100k")
    b.run(500)
    for f in dataclasses.fields(a.sim):
        va = np.asarray(getattr(a.sim, f.name))
        vb = np.asarray(getattr(b.sim, f.name))
        if not (va == vb).all():
            print(f"restore: MISMATCH in {f.name}")
            return False
    print(f"100k session restore: bitwise OK at step {int(b.sim.step)}, "
          f"rebins {int(b.sim.rebin_count)}, overflow {b.overflow}")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", action="store_true")
    ap.add_argument("--restore", action="store_true")
    args = ap.parse_args()
    if not (args.pool or args.restore):
        args.pool = args.restore = True
    ok = True
    if args.restore:
        ok &= restore_100k()
    if args.pool:
        ok &= pool_20k()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
