"""2D-normalized SPH smoothing kernels, vectorized for the VPU.

Same math as both reference implementations (CPU: src/cpu/sph2d.rs:21-45; GPU:
assets/shaders/sph_density.wgsl:53-91), expressed as branch-free masked
expressions so they fuse into the surrounding stencil computations.

- Poly6 (density):      W(r^2)   = 4/(pi h^8) (h^2 - r^2)^3        for r <= h
- Spiky gradient:       gradW(r) = -10/(pi h^5) (h - |r|)^2 r_hat  for 0 < |r| < h
- Viscosity Laplacian:  lapW(r)  = 40/(pi h^5) (h - |r|)           for 0 < |r| < h

The zero-distance cutoff uses the GPU shader's EPS = 1e-6 (sph_density.wgsl:1)
rather than the CPU's exact ``== 0.0`` — numerically identical for distinct
particles, and robust under f32.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def w_poly6(r2, h):
    """Poly6 density kernel of squared distance. Nonzero iff 0 <= r2 <= h^2."""
    h2 = h * h
    coeff = 4.0 / (jnp.pi * (h2 * h2) * (h2 * h2))  # 4 / (pi h^8)
    d = h2 - r2
    return jnp.where((r2 >= 0.0) & (r2 <= h2), coeff * d * d * d, 0.0)


def grad_spiky(rx, ry, h):
    """Spiky kernel gradient. Input is the separation vector r_i - r_j.

    Returns (gx, gy). Zero for |r| < EPS or |r| >= h.
    """
    r2 = rx * rx + ry * ry
    r = jnp.sqrt(r2)
    h5 = (h * h) * (h * h) * h
    coeff = -10.0 / (jnp.pi * h5)
    valid = (r >= EPS) & (r < h)
    safe_r = jnp.where(valid, r, 1.0)
    d = h - r
    f = jnp.where(valid, coeff * d * d / safe_r, 0.0)
    return f * rx, f * ry


def laplacian_visc(r, h):
    """Viscosity kernel Laplacian of distance. Zero for r < EPS or r >= h."""
    h5 = (h * h) * (h * h) * h
    coeff = 40.0 / (jnp.pi * h5)
    return jnp.where((r >= EPS) & (r < h), coeff * (h - r), 0.0)


def eos_pressure(rho, params):
    """Tait-like clamped linear EOS: p = k * max(rho - rho_0, 0)
    (reference: src/cpu/sph2d.rs:139, assets/shaders/sph_density.wgsl:173)."""
    return params.k * jnp.maximum(rho - params.rho_0, 0.0)


def self_density(params):
    """m * W_poly6(0): the density an isolated particle measures (its own
    contribution — the reference seeds sums with it,
    src/cpu/sph2d.rs:118).  Used wherever a particle with no computed
    neighbourhood (overflowed, suspended, extracted-while-dead) needs a
    physically-sane rho."""
    h2 = params.h * params.h
    return params.m * (4.0 / (jnp.pi * h2 ** 4)) * h2 ** 3
