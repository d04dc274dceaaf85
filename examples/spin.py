"""Sprint-1 scene analog: a spinning particle block rendered through the
on-device raster pipeline.

The reference kept a pre-fluid smoke-test scene — a spinning cube with orbit
camera and the SolidColor material (reference: examples/spin.rs + the
SceneControl/Rotates components in src/lib.rs:16-39).  The TPU framework's
equivalent smoke test: rotate a rigid block of particles on-device and render
it with the constant-color mode (the SolidColor analog), exercising raster +
frame streaming without any fluid dynamics.

  python examples/spin.py --frames 48 --out /tmp/spin_frames
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--out", default="/tmp/spin_frames")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.native import FrameSink
    from bevy_gpu_fluid_tpu.render import raster

    base = bgf.init_grid(24, 24, 0.04)
    params = bgf.FluidParams.demo()
    cx = float(jnp.mean(base.x))
    cy = float(jnp.mean(base.y))
    spec = raster.RasterSpec.fit(cx - 1.2, cx + 1.2, cy - 1.2, cy + 1.2,
                                 width=256)

    @jax.jit
    def frame(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        x = cx + (base.x - cx) * c - (base.y - cy) * s
        y = cy + (base.x - cx) * s + (base.y - cy) * c
        state = base.replace(x=x, y=y)
        return raster.to_rgb8(raster.render(state, params, spec, "const"))

    with FrameSink(args.out, width=spec.width, height=spec.height) as sink:
        for i in range(args.frames):
            sink.push(np.asarray(frame(2 * jnp.pi * i / args.frames)))
    print(f"{args.frames} spin frames -> {args.out}")


if __name__ == "__main__":
    main()
