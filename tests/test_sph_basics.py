"""The reference's four CPU unit tests, ported to the golden model
(reference: tests/sph_basics.rs)."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import (FluidParams, IntegrateConfig, init_grid)
from bevy_gpu_fluid_tpu.models import reference as golden


def _params(mu=0.1, spacing=None):
    rho_0 = 1000.0
    m = rho_0 * spacing * spacing if spacing is not None else 1.6
    return FluidParams.create(h=0.045, rho_0=rho_0, k=3.0, mu=mu, m=m)


def test_init_grid_n():
    # reference: tests/sph_basics.rs:4-18
    spacing = 0.12
    state = init_grid(10, 5, spacing)
    assert state.n == 50
    np.testing.assert_array_equal(np.asarray(state.pos[0]), [0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(state.pos[1]),
                                  [np.float32(0.12), 0.0])
    np.testing.assert_array_equal(np.asarray(state.pos[10]),
                                  [0.0, np.float32(0.12)])


def test_grid_contains_all_particles():
    # reference: tests/sph_basics.rs:21-35 — every particle lands in exactly
    # one cell of the spatial hash.
    from bevy_gpu_fluid_tpu.core.params import GridSpec2D
    from bevy_gpu_fluid_tpu.ops.binning import bin_particles

    spacing = 0.08
    state = init_grid(4, 3, spacing)
    grid = GridSpec2D.from_bounds(h=0.045, x_min=-1.0, x_max=1.0,
                                  y_min=-1.0, y_max=1.0, cap=8)
    binned = bin_particles(state.x, state.y, grid)
    assert int(jnp.sum(binned.counts)) == state.n
    assert int(binned.overflow) == 0


def test_uniform_density_compare_to_rho_0():
    # reference: tests/sph_basics.rs:38-54 — with m = rho_0 * s^2 a uniform
    # block has density within 5% of rho_0 everywhere.
    spacing = 0.04
    params = _params(spacing=spacing)
    state = init_grid(6, 6, spacing)
    state = golden.density_pressure(state, params)
    rel = jnp.abs((state.rho - params.rho_0) / params.rho_0)
    assert float(jnp.max(rel)) < 0.05


def test_integral_no_nan():
    # reference: tests/sph_basics.rs:57-72 — 50 steps stay finite (note the
    # reference test uses a POSITIVE bounce of 3.0 and x in [-3, 3]).
    spacing = 0.04
    params = _params(spacing=spacing)
    cfg = IntegrateConfig.create(dt=0.001, x_min=-3.0, x_max=3.0, bounce=3.0)
    state = init_grid(10, 10, spacing)
    state = golden.multi_step(state, params, cfg, 50)
    assert bool(jnp.all(jnp.isfinite(state.x)) and jnp.all(jnp.isfinite(state.y)))
