"""bevy_gpu_fluid_tpu — a TPU-native 2D SPH fluid framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
``bevy_gpu_fluid`` reference (Rust/Bevy + WGSL): golden-model solver,
accelerated sorted-grid solvers, parity gates, on-device rasterization,
impulse interaction, throughput benchmarks, and multi-chip spatial domain
decomposition.
"""

from .core.params import FluidParams, IntegrateConfig, GridSpec2D, GRAVITY_Y
from .core.simulation import Simulation
from .core.state import (FluidState, from_positions, init_grid, demo_block_5k,
                         make_state, lattice_gen)

__all__ = [
    "FluidParams", "IntegrateConfig", "GridSpec2D", "GRAVITY_Y",
    "FluidState", "Simulation", "from_positions", "init_grid",
    "demo_block_5k", "make_state", "lattice_gen",
]

__version__ = "0.1.0"
