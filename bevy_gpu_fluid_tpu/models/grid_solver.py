"""Accelerated SPH solver: sorted binning + dense 3x3 cell stencil, pure XLA.

TPU-native redesign of the reference's 4-pass WGSL SPH pipeline (density /
pressure / forces / integrate, reference: assets/shaders/sph_density.wgsl
entry points :113, :166, :178, :253).  Where the GPU version walked CSR cell
lists with data-dependent loop bounds, here the binned particles live in a
dense slot grid [ny, nx, cap] and each cell interacts with its 3x3
neighbourhood through *shifted views* of that grid — everything is static
shape, branch-free, gather-only (no atomics, no scatter in the hot path), and
the within-cell order is deterministic (the reference's atomic scatter was
not, assets/shaders/grid_build.wgsl:234-236).

Work is O(num_cells * cap^2 * 9) elementwise VPU ops regardless of N; empty
slots are masked.  The inner accumulation iterates over the *neighbour* slot
index kj so temporaries stay [ny, nx, cap] (never [ny, nx, cap, cap]).

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
from ..ops.binning import Binned, bin_particles, sort_field, to_dense, from_dense
from ..ops.kernels import w_poly6, grad_spiky, laplacian_visc, eos_pressure

_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


@partial(jax.tree_util.register_dataclass,
         data_fields=("overflow",), meta_fields=())
@dataclasses.dataclass
class StepDiag:
    """Per-step diagnostics (int32 overflow particle count)."""
    overflow: jax.Array


def _pad1(a: jax.Array, fill) -> jax.Array:
    """Pad a [ny, nx, cap] field with a one-cell border of ``fill``."""
    return jnp.pad(a, ((1, 1), (1, 1), (0, 0)), constant_values=fill)


def _view(padded: jax.Array, dy: int, dx: int, ny: int, nx: int) -> jax.Array:
    """The [ny, nx, cap] window of a padded field at neighbour offset."""
    return jax.lax.slice(
        padded, (1 + dy, 1 + dx, 0), (1 + dy + ny, 1 + dx + nx, padded.shape[2]))


def _dense_fields(binned: Binned, state: FluidState):
    """Bin pos/vel into dense [ny, nx, cap] slot grids."""
    xs = to_dense(binned, sort_field(binned, state.pos[:, 0]))
    ys = to_dense(binned, sort_field(binned, state.pos[:, 1]))
    vxs = to_dense(binned, sort_field(binned, state.vel[:, 0]))
    vys = to_dense(binned, sort_field(binned, state.vel[:, 1]))
    mask = binned.slot_mask.reshape(xs.shape)
    return xs, ys, vxs, vys, mask


def _density_stencil(xs, ys, mask, params: FluidParams,
                     grid: GridSpec2D) -> jax.Array:
    """rho over dense slots: m * sum over 3x3-cell neighbour slots of
    W_poly6(r^2) gated by r^2 < h^2 (reference: sph_density.wgsl:113-163).
    Self term included via the center offset's own slot."""
    ny, nx, cap = xs.shape
    h2 = params.h * params.h
    px, py, pm = _pad1(xs, 0.0), _pad1(ys, 0.0), _pad1(mask, False)

    rho = jnp.zeros_like(xs)
    for dy, dx in _OFFSETS:
        nxs = _view(px, dy, dx, ny, nx)
        nys = _view(py, dy, dx, ny, nx)
        nm = _view(pm, dy, dx, ny, nx)
        for kj in range(cap):
            ddx = xs - nxs[:, :, kj:kj + 1]
            ddy = ys - nys[:, :, kj:kj + 1]
            r2 = ddx * ddx + ddy * ddy
            ok = mask & nm[:, :, kj:kj + 1] & (r2 < h2)
            rho = rho + jnp.where(ok, w_poly6(r2, params.h), 0.0)
    return params.m * rho


def _forces_stencil(xs, ys, vxs, vys, rho_d, p_d, mask, params: FluidParams,
                    grid: GridSpec2D) -> tuple[jax.Array, jax.Array]:
    """Pressure + viscosity accelerations over dense slots
    (reference: sph_density.wgsl:178-250):
       a_p = -m (p_i + p_j) / (2 rho_j) gradW_spiky(r)
       a_v = mu m (v_j - v_i) / rho_j lapW_visc(|r|)
    The j == i self pair is excluded by slot identity at the center offset."""
    ny, nx, cap = xs.shape
    h2 = params.h * params.h
    px, py = _pad1(xs, 0.0), _pad1(ys, 0.0)
    pvx, pvy = _pad1(vxs, 0.0), _pad1(vys, 0.0)
    prho, pp = _pad1(rho_d, 1.0), _pad1(p_d, 0.0)
    pm = _pad1(mask, False)

    inv_rho_p = jnp.where(prho > 0.0, 1.0 / prho, 0.0)

    ax = jnp.zeros_like(xs)
    ay = jnp.zeros_like(xs)
    ki = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cap), 2)

    for dy, dx in _OFFSETS:
        nxs = _view(px, dy, dx, ny, nx)
        nys = _view(py, dy, dx, ny, nx)
        nvx = _view(pvx, dy, dx, ny, nx)
        nvy = _view(pvy, dy, dx, ny, nx)
        nir = _view(inv_rho_p, dy, dx, ny, nx)
        npp = _view(pp, dy, dx, ny, nx)
        nm = _view(pm, dy, dx, ny, nx)
        center = (dy == 0 and dx == 0)
        for kj in range(cap):
            ddx = xs - nxs[:, :, kj:kj + 1]
            ddy = ys - nys[:, :, kj:kj + 1]
            r2 = ddx * ddx + ddy * ddy
            ok = mask & nm[:, :, kj:kj + 1] & (r2 < h2)
            if center:
                ok = ok & (ki != kj)

            gx, gy = grad_spiky(ddx, ddy, params.h)
            fac_p = (-params.m * 0.5) * (p_d + npp[:, :, kj:kj + 1]) \
                * nir[:, :, kj:kj + 1]

            lap = laplacian_visc(jnp.sqrt(r2), params.h)
            fac_v = (params.mu * params.m) * lap * nir[:, :, kj:kj + 1]

            ax = ax + jnp.where(
                ok, fac_p * gx + fac_v * (nvx[:, :, kj:kj + 1] - vxs), 0.0)
            ay = ay + jnp.where(
                ok, fac_p * gy + fac_v * (nvy[:, :, kj:kj + 1] - vys), 0.0)
    return ax, ay


def compute_rho_p_acc(state: FluidState, params: FluidParams,
                      grid: GridSpec2D) -> tuple[FluidState, StepDiag]:
    """Density, EOS pressure, and accelerations (no integration) — the
    analog of the reference's density+pressure+forces passes."""
    binned = bin_particles(state.pos, grid)
    xs, ys, vxs, vys, mask = _dense_fields(binned, state)

    rho_d = _density_stencil(xs, ys, mask, params, grid)
    p_d = eos_pressure(rho_d, params)

    ax_d, ay_d = _forces_stencil(xs, ys, vxs, vys, rho_d, p_d, mask,
                                 params, grid)

    # Overflowed particles fall back to self-density / gravity-only.
    h2 = params.h * params.h
    self_rho = params.m * (4.0 / (jnp.pi * h2 ** 4)) * h2 ** 3  # m * W(0)
    rho = from_dense(binned, rho_d, fallback=self_rho)
    p = eos_pressure(rho, params)
    ax = from_dense(binned, ax_d, fallback=0.0)
    ay = from_dense(binned, ay_d, fallback=0.0)
    acc = jnp.stack([ax, ay + GRAVITY_Y], axis=-1)

    out = FluidState(pos=state.pos, vel=state.vel, acc=acc, rho=rho, p=p,
                     step=state.step)
    return out, StepDiag(overflow=binned.overflow)


def step_with_diag(state: FluidState, params: FluidParams,
                   cfg: IntegrateConfig,
                   grid: GridSpec2D) -> tuple[FluidState, StepDiag]:
    """One full accelerated step + diagnostics."""
    state, diag = compute_rho_p_acc(state, params, grid)
    pos, vel = integrator.euler(state.pos, state.vel, state.acc, cfg.dt)
    pos, vel = integrator.boundaries(pos, vel, cfg)
    return FluidState(pos=pos, vel=vel, acc=state.acc, rho=state.rho,
                      p=state.p, step=state.step + 1), diag


def step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
         grid: GridSpec2D) -> FluidState:
    """One full accelerated step (density -> pressure -> forces -> integrate
    -> boundaries), the analog of the reference's fused DensityNode pass
    (reference: src/gpu/pipeline.rs:284-313)."""
    return step_with_diag(state, params, cfg, grid)[0]


def multi_step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
               grid: GridSpec2D, n_steps: int) -> tuple[FluidState, StepDiag]:
    """n_steps under one jit trace; returns max overflow seen."""
    def body(carry, _):
        s, worst = carry
        s, diag = step_with_diag(s, params, cfg, grid)
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
