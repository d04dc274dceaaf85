"""Accelerated SPH solver: sorted binning + dense 3x3 cell stencil.

TPU-native redesign of the reference's 4-pass WGSL SPH pipeline (density /
pressure / forces / integrate, reference: assets/shaders/sph_density.wgsl
entry points :113, :166, :178, :253).  Where the GPU version walked CSR cell
lists with data-dependent loop bounds, here the binned particles live in a
dense slot grid [ny_pad, cap, nx_pad] (see ops/binning.py for the layout
rationale) and each cell interacts with its 3x3 neighbourhood through
*rolled views* of that grid — static shapes, branch-free, gather-only (no
atomics, no scatter in the hot path), deterministic within-cell order (the
reference's atomic scatter was not, assets/shaders/grid_build.wgsl:234-236).

Empty slots carry the FAR position sentinel, so every pair test against them
fails the r^2 < h^2 gate — no occupancy masks anywhere in the hot loop.
Work is O(num_cells * cap^2 * 9) VPU ops regardless of N.

This module holds the pure-XLA stencil implementation (runs on any backend;
the CI fallback) and the step/scan glue.  ``pallas_solver`` plugs its fused
kernels into the same glue via the ``stencils`` argument.

Overflowed particles (cell occupancy > cap) are excluded from the dense grid;
they fall back to self-density and gravity-only acceleration, and the step
reports an ``overflow`` diagnostic so callers can size ``cap``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, IntegrateConfig, GridSpec2D, GRAVITY_Y
from ..core.state import FluidState
from ..ops import integrator
from ..ops.binning import (FAR, bin_particles, to_dense, from_dense,
                           from_dense_multi)
from ..ops.kernels import (w_poly6, grad_spiky, laplacian_visc,
                           eos_pressure, self_density)

OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


@partial(jax.tree_util.register_dataclass,
         data_fields=("overflow",), meta_fields=())
@dataclasses.dataclass
class StepDiag:
    """Per-step diagnostics (int32 overflow particle count)."""
    overflow: jax.Array


def _nbr(a: jax.Array, dy: int, dx: int) -> jax.Array:
    """View with nbr[y, k, x] = a[y+dy, k, x+dx].  Wraparound is harmless:
    the ghost border guarantees wrapped values only land in ghost outputs."""
    if dy == 0 and dx == 0:
        return a
    return jnp.roll(a, (-dy, -dx), axis=(0, 2))


def density_xla(xd, yd, params: FluidParams, occ=None) -> jax.Array:
    """rho over dense slots: m * sum over 3x3-cell neighbour slots of
    W_poly6(r^2) gated by r^2 < h^2 (reference: sph_density.wgsl:113-163).
    Self term included via the center offset's own slot.  ``occ`` is
    accepted for stencil-interface compatibility and ignored (the XLA
    stencils unroll all cap slots)."""
    h = params.h
    h2 = h * h
    cap = xd.shape[1]
    rho = jnp.zeros_like(xd)
    for dy, dx in OFFSETS:
        nxs = _nbr(xd, dy, dx)
        nys = _nbr(yd, dy, dx)
        for kj in range(cap):
            ddx = xd - nxs[:, kj:kj + 1, :]
            ddy = yd - nys[:, kj:kj + 1, :]
            r2 = ddx * ddx + ddy * ddy
            rho = rho + jnp.where(r2 < h2, w_poly6(r2, h), 0.0)
    return params.m * rho


def forces_xla(xd, yd, vxd, vyd, rho_d,
               params: FluidParams, occ=None) -> tuple[jax.Array, jax.Array]:
    """Pressure + viscosity accelerations over dense slots
    (reference: sph_density.wgsl:178-250):
       a_p = -m (p_i + p_j) / (2 rho_j) gradW_spiky(r)
       a_v = mu m (v_j - v_i) / rho_j lapW_visc(|r|)
    The j == i self pair is excluded by slot identity at the center offset.

    Gating note: this stencil keeps the golden model's HARD r >= EPS gate
    (grad_spiky/laplacian_visc zero out below EPS).  The Pallas kernel uses
    a branch-free softened gate instead (rsqrt(r2 + EPS^2), see
    pallas_solver._forces_kernel) — a deliberate, documented deviation of
    O(EPS^2/r^2) relative, gated by the randomized parity sweep
    (tests/test_parity.py::test_random_configurations_parity).  The two
    accelerated backends therefore differ at ~1e-9 relative on contact
    pairs; comparisons between them use kernel-level tolerances (1e-4),
    not bitwise equality."""
    h = params.h
    h2 = h * h
    cap = xd.shape[1]
    p_d = eos_pressure(rho_d, params)
    inv_rho_d = jnp.where(rho_d > 0.0, 1.0 / rho_d, 0.0)
    ax = jnp.zeros_like(xd)
    ay = jnp.zeros_like(xd)
    ki = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)

    for dy, dx in OFFSETS:
        nxs = _nbr(xd, dy, dx)
        nys = _nbr(yd, dy, dx)
        nvx = _nbr(vxd, dy, dx)
        nvy = _nbr(vyd, dy, dx)
        nir = _nbr(inv_rho_d, dy, dx)
        npp = _nbr(p_d, dy, dx)
        center = (dy == 0 and dx == 0)
        for kj in range(cap):
            ddx = xd - nxs[:, kj:kj + 1, :]
            ddy = yd - nys[:, kj:kj + 1, :]
            r2 = ddx * ddx + ddy * ddy
            ok = r2 < h2
            if center:
                ok = ok & (ki != kj)

            gx, gy = grad_spiky(ddx, ddy, h)
            fac_p = (-params.m * 0.5) * (p_d + npp[:, kj:kj + 1, :]) \
                * nir[:, kj:kj + 1, :]

            lap = laplacian_visc(jnp.sqrt(r2), h)
            fac_v = (params.mu * params.m) * lap * nir[:, kj:kj + 1, :]

            ax = ax + jnp.where(
                ok, fac_p * gx + fac_v * (nvx[:, kj:kj + 1, :] - vxd), 0.0)
            ay = ay + jnp.where(
                ok, fac_p * gy + fac_v * (nvy[:, kj:kj + 1, :] - vyd), 0.0)
    return ax, ay


XLA_STENCILS = (density_xla, forces_xla)


def compute_rho_p_acc(state: FluidState, params: FluidParams,
                      grid: GridSpec2D,
                      stencils=XLA_STENCILS) -> tuple[FluidState, StepDiag]:
    """Density, EOS pressure, and accelerations (no integration) — the
    analog of the reference's density+pressure+forces passes."""
    density_fn, forces_fn = stencils
    binned = bin_particles(state.x, state.y, grid, with_csr=False)
    xd = to_dense(binned, state.x, fill=FAR)
    yd = to_dense(binned, state.y, fill=FAR)

    rho_d = density_fn(xd, yd, params)

    vxd = to_dense(binned, state.vx, fill=0.0)
    vyd = to_dense(binned, state.vy, fill=0.0)
    ax_d, ay_d = forces_fn(xd, yd, vxd, vyd, rho_d, params)

    # Overflowed particles fall back to self-density / gravity-only.
    self_rho = self_density(params)  # m * W(0)
    rho, ax, ay = from_dense_multi(binned, [rho_d, ax_d, ay_d],
                                   [self_rho, 0.0, 0.0])
    p = eos_pressure(rho, params)
    ay = ay + GRAVITY_Y

    out = state.replace(ax=ax, ay=ay, rho=rho, p=p)
    return out, StepDiag(overflow=binned.overflow)


def step_with_diag(state: FluidState, params: FluidParams,
                   cfg: IntegrateConfig, grid: GridSpec2D,
                   stencils=XLA_STENCILS) -> tuple[FluidState, StepDiag]:
    """One full accelerated step + diagnostics."""
    state, diag = compute_rho_p_acc(state, params, grid, stencils)
    x, y, vx, vy = integrator.euler(state.x, state.y, state.vx, state.vy,
                                    state.ax, state.ay, cfg.dt)
    x, y, vx, vy = integrator.boundaries(x, y, vx, vy, cfg)
    return state.replace(x=x, y=y, vx=vx, vy=vy, step=state.step + 1), diag


def step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
         grid: GridSpec2D, stencils=XLA_STENCILS) -> FluidState:
    """One full accelerated step (density -> pressure -> forces -> integrate
    -> boundaries), the analog of the reference's fused DensityNode pass
    (reference: src/gpu/pipeline.rs:284-313)."""
    return step_with_diag(state, params, cfg, grid, stencils)[0]


def multi_step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
               grid: GridSpec2D, n_steps: int,
               stencils=XLA_STENCILS) -> tuple[FluidState, StepDiag]:
    """n_steps under one jit trace; returns max overflow seen."""
    def body(carry, _):
        s, worst = carry
        s, diag = step_with_diag(s, params, cfg, grid, stencils)
        return (s, jnp.maximum(worst, diag.overflow)), None
    (out, worst), _ = jax.lax.scan(body, (state, jnp.int32(0)), None,
                                   length=n_steps)
    return out, StepDiag(overflow=worst)


def default_grid(params_h: float, cfg_x_min: float, cfg_x_max: float,
                 y_max: float, cap: int = 8) -> GridSpec2D:
    """Grid covering the boundary box with headroom above (no ceiling in the
    reference box, so y_max just needs splash margin)."""
    return GridSpec2D.from_bounds(h=params_h, x_min=cfg_x_min, x_max=cfg_x_max,
                                  y_min=0.0, y_max=y_max, cap=cap)
