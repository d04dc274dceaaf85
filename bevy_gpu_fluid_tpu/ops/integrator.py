"""Semi-implicit Euler integration and boundary handling.

Shared by the golden model and the accelerated solvers so the math exists in
exactly one place (the reference had it twice: src/cpu/sph2d.rs:192-220 and
assets/shaders/sph_density.wgsl:252-278).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import IntegrateConfig


def euler(pos: jax.Array, vel: jax.Array, acc: jax.Array,
          dt: jax.Array) -> tuple[jax.Array, jax.Array]:
    """v += a*dt; x += v*dt (reference: src/cpu/sph2d.rs:192-197)."""
    vel = vel + acc * dt
    pos = pos + vel * dt
    return pos, vel


def boundaries(pos: jax.Array, vel: jax.Array,
               cfg: IntegrateConfig) -> tuple[jax.Array, jax.Array]:
    """Floor + two walls, clamp position and scale the normal velocity by
    ``bounce`` (reference: src/cpu/sph2d.rs:199-220). No ceiling."""
    x, y = pos[..., 0], pos[..., 1]
    vx, vy = vel[..., 0], vel[..., 1]

    below = y < cfg.floor_y
    y = jnp.where(below, cfg.floor_y, y)
    vy = jnp.where(below, vy * cfg.bounce, vy)

    right = x > cfg.x_max
    x = jnp.where(right, cfg.x_max, x)
    vx = jnp.where(right, vx * cfg.bounce, vx)

    left = x < cfg.x_min
    x = jnp.where(left, cfg.x_min, x)
    vx = jnp.where(left, vx * cfg.bounce, vx)

    return jnp.stack([x, y], axis=-1), jnp.stack([vx, vy], axis=-1)
