"""Simulation parameters.

Single source of truth for the fluid constants — deliberately fixing the
reference's split-brain config, where the CPU solver read ``SPHState{h, rho_0,
k, mu, m}`` (reference: src/cpu/sph2d.rs:69-77) while the GPU shaders carried a
second hardcoded copy (reference: assets/shaders/sph_density.wgsl:45-49).  Here
one `FluidParams` pytree is threaded through the golden model, the XLA grid
solver, and the Pallas kernels alike.

`IntegrateConfig` mirrors the reference's integrate uniform + resource
(reference: src/gpu/ffi.rs:25-32, src/gpu/buffers.rs:110-127 — defaults
dt=0.0005, x_min=-5.0, x_max=3.0, bounce=-3.0).

`GridSpec2D` is the static (hashable) description of the binning grid.  The
reference recomputed a particle AABB and grid dims on the CPU every frame
(reference: src/gpu/buffers.rs:395-448); on TPU shapes must be static under
jit, so the grid is fixed up front from the boundary box instead.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=("h", "rho_0", "k", "mu", "m"), meta_fields=())
@dataclasses.dataclass(frozen=True)
class FluidParams:
    """SPH fluid constants (all traced leaves; changing them never recompiles).

    h:     smoothing length (also the binning cell size)
    rho_0: rest density
    k:     pressure stiffness (EOS p = k * max(rho - rho_0, 0))
    mu:    dynamic viscosity
    m:     particle mass
    """

    h: jax.Array
    rho_0: jax.Array
    k: jax.Array
    mu: jax.Array
    m: jax.Array

    @staticmethod
    def create(h: float, rho_0: float, k: float, mu: float, m: float) -> "FluidParams":
        f = lambda v: jnp.float32(v)
        return FluidParams(h=f(h), rho_0=f(rho_0), k=f(k), mu=f(mu), m=f(m))

    @staticmethod
    def demo() -> "FluidParams":
        """The reference demo constants (reference: src/cpu/sph2d.rs:230-235)."""
        return FluidParams.create(h=0.045, rho_0=1000.0, k=3.0, mu=0.2, m=1.6)


GRAVITY_Y = -9.81  # reference: src/cpu/sph2d.rs:12


@partial(jax.tree_util.register_dataclass,
         data_fields=("dt", "x_min", "x_max", "bounce", "floor_y"),
         meta_fields=())
@dataclasses.dataclass(frozen=True)
class IntegrateConfig:
    """Integration + boundary-box config.

    ``bounce`` multiplies the wall-normal velocity on contact and is negative
    in all reference demos (-3.0).  The floor is a separate plane (y=0 in the
    reference, kept configurable here).  There is deliberately no ceiling —
    the reference box is open at the top.
    """

    dt: jax.Array
    x_min: jax.Array
    x_max: jax.Array
    bounce: jax.Array
    floor_y: jax.Array

    @staticmethod
    def create(dt: float = 0.0005, x_min: float = -5.0, x_max: float = 3.0,
               bounce: float = -3.0, floor_y: float = 0.0) -> "IntegrateConfig":
        f = lambda v: jnp.float32(v)
        return IntegrateConfig(dt=f(dt), x_min=f(x_min), x_max=f(x_max),
                               bounce=f(bounce), floor_y=f(floor_y))


@dataclasses.dataclass(frozen=True)
class GridSpec2D:
    """Static spatial-hash grid over the simulation domain.

    cell_size must equal the smoothing length h so that all neighbours within
    h live in the 3x3 cell neighbourhood (same invariant as the reference,
    where the SPH shaders read the cell size as h from the grid uniform,
    reference: assets/shaders/sph_density.wgsl:54).

    ``cap`` is the max particles tracked per cell (dense slot count).  Cell
    coordinates are clamped into [0, n-1]; clamping is safe because every
    pair interaction is re-gated by r^2 < h^2 (the reference clamps its
    histogram cell index the same way, assets/shaders/grid_build.wgsl:57-66).
    """

    origin_x: float
    origin_y: float
    cell_size: float
    nx: int
    ny: int
    cap: int
    row_block: int = 8  # cell rows per Pallas program (TB)

    @property
    def num_cells(self) -> int:
        return self.nx * self.ny

    @property
    def nx_pad(self) -> int:
        """Lane-dim width of the dense layout: real cols at 1..nx plus a
        ghost col 0 and right padding, rounded up to a multiple of 128."""
        return ((self.nx + 2) + 127) // 128 * 128

    @property
    def n_row_blocks(self) -> int:
        """Interior row blocks (each row_block rows) covering ny real rows
        plus the two single ghost rows of the 3x3 stencil."""
        return -(-(self.ny + 2) // self.row_block)

    @property
    def row0(self) -> int:
        """Row index of real cell-row 0: one leading ghost BLOCK (so stencil
        taps at block r-1 never clamp) plus the single ghost stencil row."""
        return self.row_block + 1

    @property
    def ny_pad(self) -> int:
        """Total rows: ghost block + interior blocks + ghost block."""
        return (self.n_row_blocks + 2) * self.row_block

    @staticmethod
    def from_bounds(h: float, x_min: float, x_max: float,
                    y_min: float, y_max: float, cap: int = 8,
                    pad_cells: int = 2) -> "GridSpec2D":
        """Build a static grid covering the boundary box plus padding."""
        nx = int(math.ceil((x_max - x_min) / h)) + 2 * pad_cells
        ny = int(math.ceil((y_max - y_min) / h)) + 2 * pad_cells
        return GridSpec2D(
            origin_x=x_min - pad_cells * h,
            origin_y=y_min - pad_cells * h,
            cell_size=h,
            nx=nx,
            ny=ny,
            cap=cap,
        )
