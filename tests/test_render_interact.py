"""Rasterizer, impulse interaction, and checkpoint tests."""

import os

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import (FluidParams, IntegrateConfig, init_grid,
                                from_positions)
from bevy_gpu_fluid_tpu.interact.impulse import apply_impulse
from bevy_gpu_fluid_tpu.models import reference as golden
from bevy_gpu_fluid_tpu.render import raster
from bevy_gpu_fluid_tpu.utils import checkpoint


def test_density_color_ramp():
    # anchor points of the reference colormap (sph2d_cpu_demo.rs:69-82)
    c = np.asarray(raster.density_color(jnp.array([0.0, 0.5, 0.75, 1.0])))
    np.testing.assert_allclose(c[0], [0, 0, 1], atol=1e-6)    # blue
    np.testing.assert_allclose(c[1], [0, 1, 1], atol=1e-6)    # cyan
    np.testing.assert_allclose(c[2], [1, 1, 0], atol=1e-6)    # yellow
    np.testing.assert_allclose(c[3], [1, 0, 0], atol=1e-6)    # red


def test_splat_renders_particles():
    state = init_grid(8, 8, 0.04)
    params = FluidParams.demo()
    state = golden.density_pressure(state, params)
    spec = raster.RasterSpec.fit(-0.1, 0.5, -0.1, 0.5, width=128)
    img = raster.render(state, params, spec, mode="const")
    assert img.shape == (spec.height, 128, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    # particles are cyan-ish (g=b>r); background black; some lit pixels
    lit = a.sum(-1) > 0.1
    assert lit.any() and not lit.all()
    np.testing.assert_allclose(a[..., 1], a[..., 2], atol=1e-5)

    rgb8 = np.asarray(raster.to_rgb8(img))
    assert rgb8.dtype == np.uint8 and rgb8.shape == a.shape


def test_impulse_is_local_and_directional():
    # reference semantics: vel += IMPULSE * dir within r^2 < 0.04
    # (sph2d_cpu_demo.rs:135-140)
    state = from_positions(jnp.array([[0.0, 0.0], [1.0, 1.0]]))
    out = apply_impulse(state, 0.0, 0.0, 0.5, -0.25)
    np.testing.assert_allclose(np.asarray(out.vx), [5.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vy), [-2.5, 0.0], atol=1e-6)
    # positions untouched
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(state.x))


def test_impulse_changes_dynamics():
    state = init_grid(8, 8, 0.04)
    params = FluidParams.demo()
    cfg = IntegrateConfig.create()
    kicked = apply_impulse(state, 0.15, 0.15, 1.0, 0.0)
    a = golden.multi_step(state, params, cfg, 5)
    b = golden.multi_step(kicked, params, cfg, 5)
    assert float(jnp.max(jnp.abs(a.x - b.x))) > 0.0


def test_checkpoint_roundtrip(tmp_path):
    state = init_grid(5, 5, 0.04)
    params = FluidParams.demo()
    cfg = IntegrateConfig.create()
    state = golden.multi_step(state, params, cfg, 3)
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, state, params, cfg)
    s2, p2, c2 = checkpoint.load(path)
    for f in ("x", "y", "vx", "vy", "ax", "ay", "rho", "p", "step"):
        np.testing.assert_array_equal(np.asarray(getattr(state, f)),
                                      np.asarray(getattr(s2, f)))
    assert float(p2.h) == float(params.h)
    assert float(c2.dt) == float(cfg.dt)
    # resume continues identically
    a = golden.multi_step(state, params, cfg, 2)
    b = golden.multi_step(s2, p2, c2, 2)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
