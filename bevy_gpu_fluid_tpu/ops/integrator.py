"""Semi-implicit Euler integration and boundary handling (component SoA).

Shared by the golden model and the accelerated solvers so the math exists in
exactly one place (the reference had it twice: src/cpu/sph2d.rs:192-220 and
assets/shaders/sph_density.wgsl:252-278).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import IntegrateConfig


def euler(x, y, vx, vy, ax, ay, dt):
    """v += a*dt; x += v*dt (reference: src/cpu/sph2d.rs:192-197)."""
    vx = vx + ax * dt
    vy = vy + ay * dt
    return x + vx * dt, y + vy * dt, vx, vy


def boundaries(x, y, vx, vy, cfg: IntegrateConfig):
    """Floor + two walls, clamp position and scale the normal velocity by
    ``bounce`` (reference: src/cpu/sph2d.rs:199-220). No ceiling."""
    below = y < cfg.floor_y
    y = jnp.where(below, cfg.floor_y, y)
    vy = jnp.where(below, vy * cfg.bounce, vy)

    right = x > cfg.x_max
    x = jnp.where(right, cfg.x_max, x)
    vx = jnp.where(right, vx * cfg.bounce, vx)

    left = x < cfg.x_min
    x = jnp.where(left, cfg.x_min, x)
    vx = jnp.where(left, vx * cfg.bounce, vx)

    return x, y, vx, vy
