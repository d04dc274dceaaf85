"""Golden-model SPH solver: exact all-pairs neighbour sums in pure jnp.

This is the trusted oracle replacing the reference's CPU solver
(reference: src/cpu/sph2d.rs — ``SPHState::{density_pressure_calc,
accel_field_calc, integrate, apply_boundaries, step}``).  The reference used a
HashMap spatial grid purely as an optimization; its neighbour set is exactly
"all pairs with r^2 < h^2", which is what we compute directly (masked, chunked
over rows to bound memory).  Runs on the CPU backend in CI — no TPU required —
and is the parity baseline for the accelerated solvers, exactly as the
reference validated its GPU path against its CPU path
(reference: examples/gpu_parity10.rs, examples/gpu_integration_parity.rs).

Semantics preserved from the reference step (src/cpu/sph2d.rs:222-227):
  1. density (includes self-contribution) + clamped EOS pressure
  2. accelerations from NEW rho/p but pre-step pos/vel, plus gravity
  3. semi-implicit Euler:  v += a*dt;  x += v*dt
  4. boundary clamp+bounce on floor and both walls
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, IntegrateConfig, GRAVITY_Y
from ..core.state import FluidState
from ..ops import integrator
from ..ops.kernels import w_poly6, grad_spiky, laplacian_visc, eos_pressure

_CHUNK = 1024  # rows per all-pairs block; bounds peak memory at CHUNK * N


def _row_chunks(n: int):
    for s in range(0, n, _CHUNK):
        yield s, min(s + _CHUNK, n)


def _cat(parts):
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def density_pressure(state: FluidState, params: FluidParams) -> FluidState:
    """rho_i = m * sum_{j: r^2 < h^2} W_poly6(r^2);  p = k*max(rho-rho_0, 0).

    The j==i self term is included, as in the reference
    (src/cpu/sph2d.rs:123-134 — particle i is in its own cell's list).
    """
    n = state.n
    x, y = state.x, state.y
    h = params.h
    h2 = h * h
    rho_parts = []
    for s, e in _row_chunks(n):
        dx = x[s:e, None] - x[None, :]
        dy = y[s:e, None] - y[None, :]
        r2 = dx * dx + dy * dy
        # strict gate mirrors the CPU loop (src/cpu/sph2d.rs:128)
        w = jnp.where(r2 < h2, w_poly6(r2, h), 0.0)
        rho_parts.append(params.m * jnp.sum(w, axis=1))
    rho = _cat(rho_parts)
    return state.replace(rho=rho, p=eos_pressure(rho, params))


def accel_field(state: FluidState, params: FluidParams) -> FluidState:
    """Pressure + viscosity + gravity accelerations
    (reference: src/cpu/sph2d.rs:143-190):

      a_p = -m (p_i + p_j) / (2 rho_j) * gradW_spiky(r_i - r_j)
      a_v = mu m (v_j - v_i) / rho_j * lapW_visc(|r|)
    """
    n = state.n
    x, y, vx, vy = state.x, state.y, state.vx, state.vy
    rho, p = state.rho, state.p
    h, m, mu = params.h, params.m, params.mu

    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
    col = jnp.arange(n)

    ax_parts, ay_parts = [], []
    for s, e in _row_chunks(n):
        dx = x[s:e, None] - x[None, :]
        dy = y[s:e, None] - y[None, :]
        r = jnp.sqrt(dx * dx + dy * dy)
        not_self = (col[s:e, None] != col[None, :]).astype(jnp.float32)

        gx, gy = grad_spiky(dx, dy, h)
        fac_p = -m * (p[s:e, None] + p[None, :]) * (0.5 * inv_rho[None, :])

        lap = laplacian_visc(r, h)
        fac_v = mu * m * lap * inv_rho[None, :]

        axc = not_self * (fac_p * gx + fac_v * (vx[None, :] - vx[s:e, None]))
        ayc = not_self * (fac_p * gy + fac_v * (vy[None, :] - vy[s:e, None]))
        ax_parts.append(jnp.sum(axc, axis=1))
        ay_parts.append(jnp.sum(ayc, axis=1))

    return state.replace(ax=_cat(ax_parts), ay=_cat(ay_parts) + GRAVITY_Y)


def integrate(state: FluidState, cfg: IntegrateConfig) -> FluidState:
    """Semi-implicit Euler (reference: src/cpu/sph2d.rs:192-197)."""
    x, y, vx, vy = integrator.euler(state.x, state.y, state.vx, state.vy,
                                    state.ax, state.ay, cfg.dt)
    return state.replace(x=x, y=y, vx=vx, vy=vy)


def apply_boundaries(state: FluidState, cfg: IntegrateConfig) -> FluidState:
    """Clamp + bounce on floor / right wall / left wall; no ceiling
    (reference: src/cpu/sph2d.rs:199-220). ``bounce`` is negative in demos."""
    x, y, vx, vy = integrator.boundaries(state.x, state.y, state.vx,
                                         state.vy, cfg)
    return state.replace(x=x, y=y, vx=vx, vy=vy)


def step(state: FluidState, params: FluidParams,
         cfg: IntegrateConfig) -> FluidState:
    """One full golden-model step (reference: SPHState::step, sph2d.rs:222-227)."""
    state = density_pressure(state, params)
    state = accel_field(state, params)
    state = integrate(state, cfg)
    state = apply_boundaries(state, cfg)
    return state.replace(step=state.step + 1)


def multi_step(state: FluidState, params: FluidParams, cfg: IntegrateConfig,
               n_steps: int) -> FluidState:
    """n_steps golden steps under one jit trace via lax.scan."""
    def body(s, _):
        return step(s, params, cfg), None
    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out
