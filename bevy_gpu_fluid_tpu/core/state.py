"""Particle state as a structure-of-arrays pytree.

The reference stored particles as an array-of-structs (``Particle{pos, vel,
acc, rho, p}``, reference: src/cpu/sph2d.rs:48-55) — acknowledged there as a
prototyping shortcut.  On TPU the natural layout is SoA so each field maps to
contiguous (8,128)-tileable lanes.

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
         data_fields=("pos", "vel", "acc", "rho", "p", "step"), meta_fields=())
@dataclasses.dataclass
class FluidState:
    """SoA particle state.

    pos, vel, acc: float32[N, 2]; rho, p: float32[N]; step: int32 scalar.
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    rho: jax.Array
    p: jax.Array
    step: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def from_positions(pos: jax.Array) -> FluidState:
    """Zero-velocity state from positions (reference: Particle::new, sph2d.rs:57-66)."""
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    zeros2 = jnp.zeros((n, 2), jnp.float32)
    zeros1 = jnp.zeros((n,), jnp.float32)
    return FluidState(pos=pos, vel=zeros2, acc=zeros2, rho=zeros1, p=zeros1,
                      step=jnp.int32(0))


def init_grid(n_x: int, n_y: int, spacing: float) -> FluidState:
    """Lattice of n_x * n_y particles at the given spacing, x-fastest order
    (reference: SPHState::init_grid, src/cpu/sph2d.rs:92-100)."""
    ix = jnp.arange(n_x, dtype=jnp.float32)
    iy = jnp.arange(n_y, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(ix * spacing, iy * spacing, indexing="xy")
    pos = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    return from_positions(pos)


def demo_block_5k() -> tuple[FluidState, FluidParams]:
    """The 71x71 = 5,041 particle dam-break block
    (reference: SPHState::demo_block_5k, src/cpu/sph2d.rs:230-235)."""
    return init_grid(71, 71, 0.04), FluidParams.demo()


def make_state(count: int) -> tuple[FluidState, FluidParams]:
    """sqrt(count)-square lattice, the FPS-bench scene builder
    (reference: examples/bench_gpu.rs:21-26)."""
    n = int(math.isqrt(count))
    return init_grid(n, n, 0.04), FluidParams.demo()
