"""On-chip validation of the int8 routing-code plane (BGF_CODE8=1).

Runs the planar-rebin Session twice on the same 320x320 dam-break — once
with the int32 code plane, once re-execing itself with BGF_CODE8=1 — and
compares the extracted states BITWISE (the code plane is internal
routing; dtype must not change a single assignment).  The subprocess
re-exec is required because reslot.CODE_DTYPE is frozen at import.

Passing here proves the Mosaic int8 select-store / widening-load
lowering on real hardware; the HBM win is measured separately by
probe_hbm at the bracket sizes.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def run_once(out_path: str) -> None:
    import jax.numpy as jnp

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.models import verlet_solver
    from bevy_gpu_fluid_tpu.ops import reslot

    side = 320
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0,
                                      skin_factor=1.75)
    sess = verlet_solver.Session(state, params, cfg, grid,
                                 planar_rebin=True)
    sess.run(300)
    st = sess.state()
    np.savez(out_path, x=np.asarray(st.x), y=np.asarray(st.y),
             vx=np.asarray(st.vx), vy=np.asarray(st.vy),
             rebins=int(sess.sim.rebin_count),
             overflow=int(sess.overflow),
             dtype=str(reslot.CODE_DTYPE.__name__))
    print(f"# code={reslot.CODE_DTYPE.__name__} rebins="
          f"{int(sess.sim.rebin_count)} overflow={int(sess.overflow)}",
          flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        run_once(sys.argv[2])
        return 0

    env32 = dict(os.environ)
    env32.pop("BGF_CODE8", None)
    env8 = dict(os.environ, BGF_CODE8="1")
    for env, path in ((env32, "/tmp/code32.npz"), (env8, "/tmp/code8.npz")):
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--once", path], env=env, text=True)
        if r.returncode != 0:
            print(f'{{"metric": "code8_bitwise", "ok": false, '
                  f'"error": "subprocess rc={r.returncode}"}}')
            return 1

    a, b = np.load("/tmp/code32.npz"), np.load("/tmp/code8.npz")
    ok = (int(a["rebins"]) == int(b["rebins"])
          and int(a["overflow"]) == int(b["overflow"]) == 0)
    for f in ("x", "y", "vx", "vy"):
        ok = ok and bool((a[f] == b[f]).all())
    print(f"# rebins {int(a['rebins'])}/{int(b['rebins'])} "
          f"overflow {int(a['overflow'])}/{int(b['overflow'])}")
    print(f'{{"metric": "code8_bitwise", "ok": {str(ok).lower()}}}')
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
