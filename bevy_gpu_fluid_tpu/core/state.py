"""Particle state as a structure-of-arrays pytree.

The reference stored particles as an array-of-structs (``Particle{pos, vel,
acc, rho, p}``, reference: src/cpu/sph2d.rs:48-55) — acknowledged there as a
prototyping shortcut.  On TPU the natural layout is one flat array per scalar
component: a [N, 2] position array would put only 2 elements in the 128-lane
dimension and waste 98% of the VPU, so ``pos``/``vel``/``acc`` exist only as
convenience views.

``step`` mirrors the reference's ``SimStep`` counter resource (reference:
src/cpu/sph2d.rs:7-8).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from .params import FluidParams


@partial(jax.tree_util.register_dataclass,
         data_fields=("x", "y", "vx", "vy", "ax", "ay", "rho", "p", "step"),
         meta_fields=())
@dataclasses.dataclass
class FluidState:
    """SoA particle state; every field float32[N] (step: int32 scalar)."""

    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    ax: jax.Array
    ay: jax.Array
    rho: jax.Array
    p: jax.Array
    step: jax.Array

    @property
    def n(self) -> int:
        return self.x.shape[0]

    # Convenience [N, 2] views (NOT for hot paths — lane-hostile layout).
    @property
    def pos(self) -> jax.Array:
        return jnp.stack([self.x, self.y], axis=-1)

    @property
    def vel(self) -> jax.Array:
        return jnp.stack([self.vx, self.vy], axis=-1)

    @property
    def acc(self) -> jax.Array:
        return jnp.stack([self.ax, self.ay], axis=-1)

    def replace(self, **kw) -> "FluidState":
        return dataclasses.replace(self, **kw)


def from_positions(pos) -> FluidState:
    """Zero-velocity state from [N, 2] positions
    (reference: Particle::new, sph2d.rs:57-66)."""
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    return FluidState(x=pos[:, 0], y=pos[:, 1], vx=z, vy=z, ax=z, ay=z,
                      rho=z, p=z, step=jnp.int32(0))


def init_grid(n_x: int, n_y: int, spacing: float) -> FluidState:
    """Lattice of n_x * n_y particles at the given spacing, x-fastest order
    (reference: SPHState::init_grid, src/cpu/sph2d.rs:92-100)."""
    ix = jnp.arange(n_x, dtype=jnp.float32)
    iy = jnp.arange(n_y, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(ix * spacing, iy * spacing, indexing="xy")
    n = n_x * n_y
    z = jnp.zeros((n,), jnp.float32)
    return FluidState(x=xx.reshape(-1), y=yy.reshape(-1), vx=z, vy=z,
                      ax=z, ay=z, rho=z, p=z, step=jnp.int32(0))


def lattice_gen(n_x: int, spacing: float):
    """Chunk generator describing the same scene as ``init_grid(n_x, n_y,
    spacing)`` without materializing it: maps a global particle index to
    its lattice position (x-fastest order, matching the reference's
    SPHState::init_grid, src/cpu/sph2d.rs:92-100), at rest.  For
    ``verlet_solver.init_dense_gen`` / ``Session.from_generator`` — at
    very large N the four [N] planes of a materialized FluidState are
    themselves a meaningful slice of HBM."""
    def gen(gi):
        x = (gi % n_x).astype(jnp.float32) * spacing
        y = (gi // n_x).astype(jnp.float32) * spacing
        z = jnp.zeros_like(x)
        return x, y, z, z
    return gen


def demo_block_5k() -> tuple[FluidState, FluidParams]:
    """The 71x71 = 5,041 particle dam-break block
    (reference: SPHState::demo_block_5k, src/cpu/sph2d.rs:230-235)."""
    return init_grid(71, 71, 0.04), FluidParams.demo()


def make_state(count: int) -> tuple[FluidState, FluidParams]:
    """sqrt(count)-square lattice, the FPS-bench scene builder
    (reference: examples/bench_gpu.rs:21-26)."""
    n = int(math.isqrt(count))
    return init_grid(n, n, 0.04), FluidParams.demo()
