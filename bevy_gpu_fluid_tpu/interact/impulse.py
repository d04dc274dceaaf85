"""External impulse injection — the "touch the fluid" interaction.

Pure-function equivalent of the reference's mouse drag system
(reference: examples/sph2d_cpu_demo.rs:112-141 ``apply_drag``): every particle
within INTERACTION_AREA (squared distance 0.04) of the cursor's world position
gets ``vel += IMPULSE * force_dir``, where force_dir is the cursor's world-
space motion since the last frame.  The host (UI or script) supplies
cursor/delta in world units; screen-to-world mapping is the host's concern
(reference did it at RENDER_SCALE=100 px/unit, sph2d_cpu_demo.rs:129-133).

Applied between steps; jit-friendly and shardable (pure elementwise).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import FluidState

IMPULSE = 10.0            # reference: sph2d_cpu_demo.rs:17
INTERACTION_AREA = 0.04   # squared radius, reference: sph2d_cpu_demo.rs:16


def apply_impulse(state: FluidState, cursor_x, cursor_y, dir_x, dir_y,
                  impulse: float = IMPULSE,
                  interaction_area: float = INTERACTION_AREA) -> FluidState:
    """vel += impulse * (dir_x, dir_y) for particles with
    |pos - cursor|^2 < interaction_area."""
    vx, vy = apply_impulse_arrays(
        state.x, state.y, state.vx, state.vy, cursor_x, cursor_y,
        dir_x, dir_y, impulse, interaction_area)
    return state.replace(vx=vx, vy=vy)


def apply_impulse_arrays(x, y, vx, vy, cursor_x, cursor_y, dir_x, dir_y,
                         impulse: float = IMPULSE,
                         interaction_area: float = INTERACTION_AREA):
    """Array form of apply_impulse, shape-agnostic — works on per-particle
    [N] fields and on the dense [rows, cap, lanes] slot fields alike (empty
    slots carry FAR positions and can never be within interaction range).
    Returns (vx, vy)."""
    dx = x - cursor_x
    dy = y - cursor_y
    hit = dx * dx + dy * dy < interaction_area
    return (jnp.where(hit, vx + impulse * dir_x, vx),
            jnp.where(hit, vy + impulse * dir_y, vy))
