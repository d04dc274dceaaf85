"""Scalable density-field raster tests (BASELINE config #4's renderer)."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import FluidParams, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver, reference as golden
from bevy_gpu_fluid_tpu.ops.binning import FAR, bin_particles, to_dense
from bevy_gpu_fluid_tpu.render import raster

PARAMS = FluidParams.demo()
GRID = grid_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)


def _dense(state):
    b = bin_particles(state.x, state.y, GRID, with_csr=False)
    return (to_dense(b, state.x, fill=FAR), to_dense(b, state.y, fill=FAR))


def test_field_matches_particle_density():
    # sampling the field AT a particle's position reproduces its SPH density
    state = init_grid(20, 20, 0.04)
    xd, yd = _dense(state)
    field = raster.field_density(xd, yd, PARAMS, GRID, px_per_cell=1)
    # px_per_cell=1 samples cell centers; move one particle exactly onto a
    # cell center and check the field there vs the golden density
    cs = GRID.cell_size
    cx, cy = 30, 28
    px = GRID.origin_x + (cx + 0.5) * cs
    py = GRID.origin_y + (cy + 0.5) * cs
    state2 = state.replace(x=state.x.at[0].set(px), y=state.y.at[0].set(py))
    xd, yd = _dense(state2)
    field = raster.field_density(xd, yd, PARAMS, GRID, px_per_cell=1)
    g = golden.density_pressure(state2, PARAMS)
    np.testing.assert_allclose(float(field[cy, cx]), float(g.rho[0]),
                               rtol=1e-4)


def test_field_render_shape_and_support():
    state = init_grid(16, 16, 0.04)
    xd, yd = _dense(state)
    img = raster.field_render(xd, yd, PARAMS, GRID, px_per_cell=2)
    assert img.shape == (GRID.ny * 2, GRID.nx * 2, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    wet = a.sum(-1) > 0.05
    assert wet.any() and not wet.all()
    # wet region roughly matches the block footprint (0..0.6 world units)
    rows, cols = np.nonzero(wet)
    cs = GRID.cell_size / 2
    assert cols.min() * cs + GRID.origin_x > -0.2
    assert cols.max() * cs + GRID.origin_x < 0.9

    cimg = np.asarray(raster.field_render(xd, yd, PARAMS, GRID, 2, "const"))
    np.testing.assert_allclose(cimg[wet][:, 1:], 1.0, atol=1e-6)  # cyan


def test_field_pallas_matches_xla():
    """The Pallas field kernel (production streaming renderer) reproduces
    the XLA reference field up to f32 summation order, at both sampling
    densities."""
    state = init_grid(20, 20, 0.04)
    xd, yd = _dense(state)
    for P in (1, 2):
        ref = raster.field_density(xd, yd, PARAMS, GRID, px_per_cell=P)
        got = raster.field_density_pallas(xd, yd, PARAMS, GRID,
                                          px_per_cell=P, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-2)


def test_field_frame_matches_render_plus_rgb8():
    """field_frame (planar uint8 streaming path) == to_rgb8(field_render)."""
    state = init_grid(16, 16, 0.04)
    xd, yd = _dense(state)
    for mode in ("density", "const"):
        a = np.asarray(raster.field_frame(xd, yd, PARAMS, GRID, 2, mode))
        b = np.asarray(raster.to_rgb8(
            raster.field_render(xd, yd, PARAMS, GRID, 2, mode)))
        assert a.shape == b.shape and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)
