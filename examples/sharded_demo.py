"""Multi-chip dam-break demo: the full production sharded pipeline,
end-to-end, streaming only finished frames to host.

Spatial slab decomposition over a ``jax.sharding.Mesh`` (one x-slab per
device), deferred rebinning with the collective reslot rebin, the FUSED
Pallas forces+integrate kernel per slab, and per-slab on-device raster
strips (parallel/shard_render.py) — particle state never leaves the
devices; per-particle identity is tracked throughout and the final frame's
state round-trips through a resident checkpoint.

On the single-chip rig this runs on a virtual CPU mesh by default
(--devices 8); on a real multi-chip host drop --cpu to use the hardware
mesh.  The reference's closest analog is its single-GPU readback demo
(reference: examples/gpu_demo.rs) — it had no multi-device story at all.

Usage:
  python examples/sharded_demo.py --devices 8 --frames 12 --out /tmp/shframes
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n-cols", type=int, default=80)
    ap.add_argument("--n-rows", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--substeps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/sharded_frames")
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="virtual CPU mesh (default on this 1-chip rig); "
                         "pass --no-cpu on a real multi-chip host")
    ap.add_argument("--no-cpu", dest="cpu", action="store_false")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_cache_cpu"))
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.parallel import shard
    from bevy_gpu_fluid_tpu.parallel.sharded_session import ShardedSession

    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=2.5, bounce=-0.5)
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=args.devices,
                                 capacity=4096)

    # wide shallow block spanning every slab, dropped under gravity
    state = bgf.init_grid(args.n_cols, args.n_rows, 0.04)
    state = state.replace(x=state.x - 0.98, y=state.y + 0.5)
    sess = ShardedSession(state, params, cfg, spec,
                          interpret=True if args.cpu else None)

    os.makedirs(args.out, exist_ok=True)
    for f in range(args.frames):
        img = np.asarray(sess.run_frame(substeps=args.substeps))
        h, w, _ = img.shape
        with open(f"{args.out}/frame_{f:04d}.ppm", "wb") as fh:
            fh.write(f"P6\n{w} {h}\n255\n".encode())
            fh.write(img.tobytes())
        print(f"frame {f}: {w}x{h}, per-device alive {sess.alive}, "
              f"rebins {sess.rebin_count}, overflow {sess.overflow}",
              flush=True)

    assert sum(sess.alive) == state.n, "particles not conserved"
    assert sess.dropped == 0

    # resident checkpoint round trip + ORIGINAL-order extraction via the
    # tracked per-particle identity
    ckpt = f"{args.out}/sharded_ckpt"
    sess.save(ckpt)
    sess2 = ShardedSession.restore(ckpt,
                                   interpret=True if args.cpu else None)
    fs = sess2.state()
    assert bool(jnp.isfinite(fs.x).all())
    print(f"done: {args.frames} frames in {args.out}, checkpoint verified, "
          f"{sess2.n} particles in original order")


if __name__ == "__main__":
    main()
