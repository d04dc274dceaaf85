"""Stress / degradation tests: the framework must stay finite and keep
honest diagnostics in regimes the reference never exercised (its max
demonstrated N was 10,000 and it had no failure accounting at all).

Complements tests/test_overflow.py (capacity overflow semantics); here the
stressors are scene regime and interaction extremes.
"""

import math

import jax
import jax.numpy as jnp

from bevy_gpu_fluid_tpu import Simulation
from bevy_gpu_fluid_tpu.core.state import from_positions


def test_pool_scene_settles_finite():
    """The recommended production scene (wide shallow pool, dissipative
    bounce) runs long without overflow, energy runaway, or NaN."""
    sim = Simulation.pool(n=6400, aspect=16.0)
    sim.run(300)
    s = sim.state
    assert sim.overflow == 0
    assert bool(jnp.isfinite(s.x).all() and jnp.isfinite(s.vx).all())
    # dissipative walls: the pool settles instead of running away
    vmax = float(jnp.max(jnp.sqrt(s.vx ** 2 + s.vy ** 2)))
    assert vmax < 10.0, f"pool did not settle: max |v| = {vmax:.1f}"
    assert float(s.y.min()) >= float(sim.cfg.floor_y) - 1e-6
    assert float(s.x.min()) >= float(sim.cfg.x_min) - 1e-6
    assert float(s.x.max()) <= float(sim.cfg.x_max) + 1e-6


def test_extreme_kick_stays_in_box():
    """A drag impulse far beyond the reference's IMPULSE=10 slams particles
    into the walls; positions must stay clamped and finite, and any capacity
    loss must surface in the overflow diagnostic rather than silently."""
    sim = Simulation.dam_break(n=1024)
    sim.run(20)
    sim.kick(0.5, 0.5, dir_x=1.0, dir_y=0.2, impulse=1000.0)
    sim.run(100)
    s = sim.state
    alive = s.x < 1e8  # dropped particles surface as FAR positions
    assert bool(jnp.isfinite(jnp.where(alive, s.x, 0.0)).all())
    assert bool(jnp.isfinite(jnp.where(alive, s.vx, 0.0)).all())
    assert float(jnp.where(alive, s.x, 0.0).max()) <= float(sim.cfg.x_max) + 1e-6
    assert float(jnp.where(alive, s.x, sim.cfg.x_max).min()) >= \
        float(sim.cfg.x_min) - 1e-6
    n_dead = int(jnp.sum(~alive))
    assert sim.overflow >= n_dead  # every lost particle is accounted for


def test_single_particle_gravity_and_selfdensity():
    """One particle: analytic self-density, pure gravity fall, floor bounce
    keeps it in the box (the degenerate grid / empty-neighbourhood path)."""
    from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig
    from bevy_gpu_fluid_tpu.models import verlet_solver

    params = FluidParams.demo()
    cfg = IntegrateConfig.create()
    grid = verlet_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0, cap=8)
    one = from_positions(jnp.array([[0.5, 2.0]]))
    out, diag, _ = jax.jit(
        lambda s: verlet_solver.multi_step(s, params, cfg, grid, 400))(one)
    h = float(params.h)
    self_rho = float(params.m) * 4.0 / (math.pi * h ** 8) * h ** 6
    assert abs(float(out.rho[0]) - self_rho) < 1e-2
    assert int(diag.overflow) == 0
    assert bool(jnp.isfinite(out.y).all())
    assert float(out.y[0]) >= float(cfg.floor_y) - 1e-6
