"""Multi-chip on-device rendering (parallel/shard_render.py): per-slab
field-raster strips with psum'd colormap bounds, gated against the
single-chip raster of the same (unsharded) state."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu.ops.binning import FAR, bin_particles, to_dense
from bevy_gpu_fluid_tpu.parallel import shard, shard_render, shard_verlet
from bevy_gpu_fluid_tpu.render import raster


def _single_chip_frame(fs, runs, mode="density"):
    spec = runs["spec"]
    gg = dataclasses.replace(spec.local_grid,
                             nx=spec.n_devices * spec.nx_local)
    b = bin_particles(fs.x, fs.y, gg, with_csr=False)
    xd = to_dense(b, fs.x, fill=FAR)
    yd = to_dense(b, fs.y, fill=FAR)
    return np.asarray(raster.field_frame(xd, yd, runs["params"], gg,
                                         px_per_cell=2, mode=mode))


def test_sharded_frame_matches_at_init(sverlet_d4):
    """At init the slot structures of the sharded and global binnings are
    identical (stable sort within cells in both), so per-pixel sums share
    values and order; the only divergence source is pixel-coordinate
    rounding (per-slab ``ox + l*cs`` vs global ``origin + (d*nxl+l)*cs``
    differ at f32 ulps), which can flip a u8 by at most one count at
    quantization boundaries."""
    runs = sverlet_d4
    spec = runs["spec"]
    mesh = shard.make_mesh(4)
    init_fn, _ = shard_verlet.make_sharded_verlet_step(
        runs["params"], runs["cfg"], spec, mesh)
    sim0 = init_fn(shard.shard_state(runs["state"], spec))
    frame_fn = shard_render.make_sharded_frame(runs["params"], spec, mesh)
    img_s = np.asarray(frame_fn(sim0))
    img_1 = _single_chip_frame(runs["state"], runs)
    assert img_s.shape == img_1.shape
    diff = np.abs(img_s.astype(int) - img_1.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() >= 0.99


def test_sharded_frame_matches_single_chip_after_run(sverlet_d4):
    """After migration + rebins the slot (summation) order differs from a
    fresh global sort, so pixels may differ by f32 rounding at u8
    quantization boundaries — but by at most 1 count, almost nowhere."""
    runs = sverlet_d4
    spec = runs["spec"]
    mesh = shard.make_mesh(4)
    frame_fn = shard_render.make_sharded_frame(runs["params"], spec, mesh)
    img_s = np.asarray(frame_fn(runs["xla"]))
    fs = shard_verlet.extract_fluid_state(runs["xla"], spec, runs["params"],
                                         runs["n"])
    img_1 = _single_chip_frame(fs, runs)
    assert img_s.shape == img_1.shape
    diff = np.abs(img_s.astype(int) - img_1.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() >= 0.99

    # the frame is non-trivial and seamless: wet pixels exist on both
    # sides of every interior slab boundary (the scene spans all slabs)
    wet = img_s.sum(-1) > 10
    W_l = img_s.shape[1] // spec.n_devices
    for k in range(1, spec.n_devices):
        assert wet[:, W_l * k - 1].any(), f"no wet pixels left of seam {k}"
        assert wet[:, W_l * k].any(), f"no wet pixels right of seam {k}"


def test_sharded_frame_const_mode(sverlet_d4):
    runs = sverlet_d4
    mesh = shard.make_mesh(4)
    frame_fn = shard_render.make_sharded_frame(runs["params"], runs["spec"],
                                               mesh, mode="const")
    img = np.asarray(frame_fn(runs["xla"]))
    wet = img.sum(-1) > 0
    assert wet.any() and not wet.all()
    # const mode is pure cyan where wet
    assert (img[wet] == np.array([0, 255, 255], np.uint8)).all()
