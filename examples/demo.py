"""Headless dam-break demo: simulate on-device, rasterize on-device, stream
only finished frames to host as PPM images.

The TPU-native analog of the reference's interactive demos
(reference: examples/sph2d_cpu_demo.rs and examples/gpu_demo.rs): same
5,041-particle dam-break scene (or --n to change), same two view modes
(--mode const|density), and a scripted "mouse drag" impulse injected
mid-run standing in for pointer input (reference: apply_drag,
sph2d_cpu_demo.rs:112-141).

Usage:
  python examples/demo.py --out /tmp/frames --frames 60 --substeps 16
  python examples/demo.py --n 1024 --mode const --cpu
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    h, w, _ = rgb8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb8.tobytes())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5041)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--substeps", type=int, default=16,
                    help="sim steps per frame (dt=0.0005 each)")
    ap.add_argument("--mode", choices=["density", "const"], default="density")
    ap.add_argument("--out", default="/tmp/tpu_fluid_frames")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--solver", choices=["verlet", "pallas", "xla", "golden"],
                    default="verlet")
    ap.add_argument("--kick-frame", type=int, default=30,
                    help="frame at which a scripted impulse is injected")
    ap.add_argument("--sink", choices=["native", "python"], default="native",
                    help="native = async C++ FrameSink (encode/IO off the "
                         "sim loop); python = synchronous writes")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.interact.impulse import apply_impulse
    from bevy_gpu_fluid_tpu.models import (grid_solver, pallas_solver,
                                           verlet_solver)
    from bevy_gpu_fluid_tpu.models import reference as golden
    from bevy_gpu_fluid_tpu.render import raster

    side = int(math.isqrt(args.n))
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create()  # x in [-5, 3], bounce=-3
    grid = grid_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0, cap=8)
    vgrid = verlet_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0, cap=8)
    spec = raster.RasterSpec.fit(-5.0, 3.0, 0.0, 4.0, width=args.width)

    if args.solver == "golden":
        def advance(s):
            return golden.multi_step(s, params, cfg, args.substeps)
    elif args.solver == "xla":
        def advance(s):
            return grid_solver.multi_step(s, params, cfg, grid,
                                          args.substeps)[0]
    elif args.solver == "verlet":
        def advance(s):
            return verlet_solver.multi_step(s, params, cfg, vgrid,
                                            args.substeps)[0]
    else:
        def advance(s):
            return pallas_solver.multi_step(s, params, cfg, grid,
                                            args.substeps)[0]

    @jax.jit
    def frame(s):
        s = advance(s)
        img = raster.to_rgb8(raster.render(s, params, spec, args.mode))
        return s, img

    os.makedirs(args.out, exist_ok=True)
    sink = None
    if args.sink == "native":
        try:
            from bevy_gpu_fluid_tpu.native import FrameSink
            sink = FrameSink(args.out, width=spec.width, height=spec.height)
        except Exception as e:  # no g++ on this host -> python writes
            print(f"native sink unavailable ({e}); falling back to python",
                  file=sys.stderr)

    t0 = time.time()
    dropped = 0
    for i in range(args.frames):
        if i == args.kick_frame:
            # scripted drag: push fluid up-right near the block's center
            state = apply_impulse(state, 1.0, 0.3, 0.6, 0.45)
        state, img = frame(state)
        if sink is not None:
            dropped += 0 if sink.push(np.asarray(img)) else 1
        else:
            write_ppm(os.path.join(args.out, f"frame_{i:06d}.ppm"),
                      np.asarray(img))
    jax.block_until_ready(state.x)
    dt = time.time() - t0
    if sink is not None:
        sink.close()
    n = state.n
    print(f"{args.frames} frames x {args.substeps} steps of {n} particles "
          f"in {dt:.2f}s ({args.frames / dt:.1f} fps incl. first-frame "
          f"compile; backend={jax.default_backend()}, solver={args.solver}, "
          f"sink={args.sink}, dropped={dropped})")
    print(f"frames written to {args.out}/frame_*.ppm")


if __name__ == "__main__":
    main()
