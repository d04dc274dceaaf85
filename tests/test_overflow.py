"""Cell-capacity overflow: the degradation story, exercised (overflow > 0).

Every other test asserts overflow == 0; this one deliberately overfills a
cell (9 particles at 0.01 spacing all hash to one 0.045 cell, cap=8) and
pins down the DOCUMENTED per-solver behavior:

* eager grid/pallas solvers: overflowed particles fall back to self-density
  and gravity-only acceleration — they keep integrating, nothing NaNs
  (models/grid_solver.py overflow fallback);
* verlet solver: overflowed particles lose their slot and stay dead until
  the run ends — they surface as FAR positions and are counted in the
  overflow diagnostic (models/verlet_solver.py _extract docstring).

In both cases: every lost interaction is COUNTED, dynamics stay finite, and
the diagnostic lets callers size ``cap``.
"""

import jax.numpy as jnp

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops.binning import FAR

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5, bounce=-0.5)


def crowded_state():
    # 3x3 block at 0.004 spacing: all 9 particles land in one cell for both
    # the h cells (0.045, eager) and the skinned 1.5h cells (0.0675, verlet)
    return init_grid(3, 3, 0.004)


def test_eager_overflow_keeps_integrating():
    grid = grid_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)
    state = crowded_state()
    out, diag = grid_solver.multi_step(state, PARAMS, CFG, grid, 10)
    assert int(diag.overflow) >= 1
    # ALL particles (including the overflowed one) keep finite dynamics
    assert bool(jnp.isfinite(out.x).all() & jnp.isfinite(out.y).all())
    assert bool(jnp.isfinite(out.vx).all() & jnp.isfinite(out.vy).all())
    # everyone kept integrating: the overcrowded cluster blasted apart
    # (physical: enormous EOS pressure) and no particle is frozen in place
    moved = (out.x != state.x) | (out.y != state.y)
    assert bool(moved.all())
    # self-density fallback: no zero/garbage densities anywhere
    assert float(jnp.min(out.rho)) > 900.0


def test_verlet_overflow_drops_and_counts():
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()
    out, diag, _ = verlet_solver.multi_step(state, PARAMS, CFG, grid, 10)
    n_over = int(diag.overflow)
    assert n_over >= 1
    live = out.x < FAR * 0.5
    # dropped particles surface as FAR positions; everyone else is finite
    assert int(jnp.sum(~live)) == n_over
    assert bool(jnp.isfinite(jnp.where(live, out.x, 0.0)).all())
    assert bool(jnp.isfinite(jnp.where(live, out.vx, 0.0)).all())
    # live + dropped accounts for every particle: nothing silently vanishes
    assert int(jnp.sum(live)) + n_over == state.n
