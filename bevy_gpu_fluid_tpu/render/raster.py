"""On-device rasterization: particles -> RGB frames, entirely on TPU.

Replaces the reference's GPU->CPU readback bridge + per-particle Bevy sprite
sync (reference: examples/gpu_demo.rs:58-148 — a 5-state map/copy FSM spinning
on the host every frame).  Here the simulation state never leaves the device:
frames are rasterized on-TPU and only finished RGB images stream to host.

Two view modes, as the reference's Space-toggled ``ViewMode``
(sph2d_cpu_demo.rs:30-34):

* const color — every splat cyan (CYAN, sph2d_cpu_demo.rs:18);
* density color — per-frame min/max-normalized rho through the blue -> cyan
  -> yellow -> red ramp (``density_color``, sph2d_cpu_demo.rs:69-82).

Splatting: each particle scatter-adds a Poly6-weighted S x S pixel stamp at
its position (the field analog of the reference's PARTICLE_SIZE=15px sprites).
Scatter-add is deterministic (commutative) and static-shape; good to ~100k
particles per frame.  A Pallas gather-based raster for millions of particles
can reuse the binning stencil later.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import FluidParams
from ..core.state import FluidState
from ..ops.kernels import w_poly6

CYAN = (0.0, 1.0, 1.0)  # reference: sph2d_cpu_demo.rs:18


@dataclasses.dataclass(frozen=True)
class RasterSpec:
    """Static raster description: world window [x0, x0+w/scale] x [y0, ...]
    rendered to a h x w image at ``scale`` px/world-unit (the reference used
    RENDER_SCALE=100, sph2d_cpu_demo.rs:10)."""

    x0: float
    y0: float
    scale: float
    height: int
    width: int
    stamp: int = 9  # splat stamp size in px (odd)

    @staticmethod
    def fit(x_min: float, x_max: float, y_min: float, y_max: float,
            width: int = 512, stamp: int = 9) -> "RasterSpec":
        scale = width / (x_max - x_min)
        height = int(round((y_max - y_min) * scale))
        return RasterSpec(x0=x_min, y0=y_min, scale=scale, height=height,
                          width=width, stamp=stamp)


def _colormap_planes(t: jax.Array):
    """Blue -> cyan -> yellow -> red ramp over t in [0, 1] as separate
    (r, g, b) planes (reference: sph2d_cpu_demo.rs:69-82).  Planar on
    purpose: ops on channels-last [H, W, 3] arrays run at 3/128 lane
    utilization on TPU, so image pipelines must stay per-plane and stack
    exactly once at the end."""
    t = jnp.clip(t, 0.0, 1.0)
    u1 = t * 2.0
    u2 = (t - 0.5) / 0.25
    u3 = (t - 0.75) / 0.25
    r = jnp.where(t < 0.5, 0.0, jnp.where(t < 0.75, u2, 1.0))
    g = jnp.where(t < 0.5, u1, jnp.where(t < 0.75, 1.0, 1.0 - u3))
    b = jnp.where(t < 0.5, 1.0, jnp.where(t < 0.75, 1.0 - u2, 0.0))
    return r, g, b


def density_color(t: jax.Array) -> jax.Array:
    """Colormap of t in [0, 1]; t: [...]; returns [..., 3]."""
    return jnp.stack(_colormap_planes(t), axis=-1)


def particle_colors(state: FluidState, mode: str = "density") -> jax.Array:
    """[N, 3] colors; 'density' normalizes rho per frame like the reference's
    sync_particles (sph2d_cpu_demo.rs:150-183), 'const' is plain cyan."""
    n = state.n
    if mode == "const":
        return jnp.broadcast_to(jnp.array(CYAN, jnp.float32), (n, 3))
    lo = jnp.min(state.rho)
    hi = jnp.max(state.rho)
    inv = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return density_color((state.rho - lo) * inv)


def splat(state: FluidState, params: FluidParams, spec: RasterSpec,
          colors: jax.Array) -> jax.Array:
    """Rasterize to a float [H, W, 3] image (origin bottom-left).

    Each particle deposits W_poly6(r^2)-weighted color over an S x S stamp;
    the image is color-sum / weight-sum per pixel (transparent background
    stays black)."""
    s = spec.stamp
    half = s // 2
    # particle center in pixel space
    px = (state.x - spec.x0) * spec.scale
    py = (state.y - spec.y0) * spec.scale

    # stamp pixel offsets
    oi = jnp.arange(s, dtype=jnp.int32) - half
    ci = jnp.floor(px).astype(jnp.int32)
    cj = jnp.floor(py).astype(jnp.int32)
    cols = ci[:, None] + oi[None, :]                    # [N, S]
    rows = cj[:, None] + oi[None, :]                    # [N, S]

    # Poly6 weight at each stamp pixel center (world units)
    wx = (cols.astype(jnp.float32) + 0.5) / spec.scale + spec.x0
    wy = (rows.astype(jnp.float32) + 0.5) / spec.scale + spec.y0
    dx = wx - state.x[:, None]                          # [N, S]
    dy = wy - state.y[:, None]
    r2 = dx[:, :, None] ** 2 + dy[:, None, :] ** 2      # [N, Sx, Sy]
    w = w_poly6(r2, params.h)                           # [N, Sx, Sy]

    rows_b = jnp.broadcast_to(rows[:, None, :], r2.shape)
    cols_b = jnp.broadcast_to(cols[:, :, None], r2.shape)

    wsum = jnp.zeros((spec.height, spec.width), jnp.float32)
    wsum = wsum.at[rows_b, cols_b].add(w, mode="drop")
    csum = jnp.zeros((spec.height, spec.width, 3), jnp.float32)
    csum = csum.at[rows_b, cols_b].add(
        w[..., None] * colors[:, None, None, :], mode="drop")

    img = csum / jnp.maximum(wsum, 1e-12)[..., None]
    # fade to black where total weight is tiny (background)
    alpha = jnp.clip(wsum / (0.25 * jnp.max(wsum) + 1e-12), 0.0, 1.0)
    return img * alpha[..., None]


def render(state: FluidState, params: FluidParams, spec: RasterSpec,
           mode: str = "density") -> jax.Array:
    """Full frame: colors + splat -> float image [H, W, 3] in [0, 1]."""
    return splat(state, params, spec, particle_colors(state, mode))


def to_rgb8(img: jax.Array) -> jax.Array:
    """[H, W, 3] float -> uint8, flipped so row 0 is the TOP of the frame
    (world y up)."""
    img8 = jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return img8[::-1]


# ---------------------------------------------------------------------------
# Field raster: scales to millions of particles (BASELINE config #4).
#
# The splat raster above is per-particle scatter-add — fine to ~100k.  The
# field raster instead evaluates the SPH density field at pixel centers
# through the binned dense grid: each pixel sums W_poly6 over the 3x3 cell
# neighbourhood of its containing cell, with ``px_per_cell`` subpixels per
# cell.  Work is O(pixels * 9 * cap) VPU ops over the same rolled dense
# views as the solver stencils — no gathers, no scatters, no per-particle
# cost at all.
# ---------------------------------------------------------------------------


def field_density(xd: jax.Array, yd: jax.Array, params: FluidParams,
                  grid, px_per_cell: int = 2) -> jax.Array:
    """SPH density field sampled on a pixel lattice aligned to the binning
    grid: returns float[ny*P, nx*P] (world orientation, row 0 = bottom).

    xd/yd: dense slot positions [ny_pad, cap, nx_pad] (FAR = empty), as held
    by the solvers — the verlet solver can render straight from its resident
    state with zero extra data movement."""
    P = px_per_cell
    h = params.h
    h2 = h * h
    cs = grid.cell_size
    ny, nx, cap = grid.ny, grid.nx, grid.cap

    # real-cell window plus one ghost ring for the 3x3 taps
    x0 = grid.row0 - 1
    xs = jax.lax.slice(xd, (x0, 0, 0), (x0 + ny + 2, cap, grid.nx_pad))
    ys = jax.lax.slice(yd, (x0, 0, 0), (x0 + ny + 2, cap, grid.nx_pad))

    # base pixel world coords per cell (subpixel offsets added per pass);
    # all temporaries stay [ny, nx] — lane-clean and padding-free
    cell_x0 = grid.origin_x + jnp.arange(nx, dtype=jnp.float32)[None, :] * cs
    cell_y0 = grid.origin_y + jnp.arange(ny, dtype=jnp.float32)[:, None] * cs

    coeff = params.m * 4.0 / (jnp.pi * (h2 * h2) * (h2 * h2))
    sub_fields = []
    for sy in range(P):
        for sx in range(P):
            px = cell_x0 + ((sx + 0.5) / P) * cs       # [1, nx]
            py = cell_y0 + ((sy + 0.5) / P) * cs       # [ny, 1]
            rho = jnp.zeros((ny, nx), jnp.float32)
            for dy in (0, 1, 2):
                tx = jax.lax.slice(xs, (dy, 0, 1), (dy + ny, cap, 1 + nx))
                ty = jax.lax.slice(ys, (dy, 0, 1), (dy + ny, cap, 1 + nx))
                for dx in (-1, 0, 1):
                    rx = tx if dx == 0 else jnp.roll(tx, -dx, axis=-1)
                    ry = ty if dx == 0 else jnp.roll(ty, -dx, axis=-1)
                    for kj in range(cap):
                        ddx = px - rx[:, kj, :]
                        ddy = py - ry[:, kj, :]
                        r2 = ddx * ddx + ddy * ddy
                        d = h2 - r2
                        rho = rho + jnp.where(r2 < h2, d * d * d, 0.0)
            sub_fields.append(rho * coeff)

    # interleave the P*P subfields into [ny*P, nx*P]
    stacked = jnp.stack(sub_fields).reshape(P, P, ny, nx)
    return stacked.transpose(2, 0, 3, 1).reshape(ny * P, nx * P)


# -- Pallas field raster: the production streaming renderer ----------------
#
# Same arithmetic as ``field_density`` (identical up to f32 summation
# order), but as a halo-DMA stencil kernel like the solver's: all P*P
# subpixels of a cell ride the sublane dim and the j-slot loops are
# occupancy-adaptive.  At 1M: 2.3 ms/frame vs 7.4 ms for the unrolled
# 9*cap*P^2 XLA graph (both pay a long first compile; the persistent
# cache makes it once per grid shape).


def _field_kernel(pr, occ, x_hbm, y_hbm, out_ref, xs, ys, sems, *,
                  tb, P, grid):
    import jax.experimental.pallas as pl

    from ..models.pallas_solver import _copy_slab

    r = pl.program_id(0)
    row_start = (r + 1) * tb - 1
    cx = _copy_slab(x_hbm, xs, sems.at[0], row_start, tb + 2)
    cy = _copy_slab(y_hbm, ys, sems.at[1], row_start, tb + 2)
    cx.start()
    cy.start()
    cx.wait()
    cy.wait()

    h = pr[0, 0]
    m = pr[0, 1]
    ox = pr[0, 5]    # world origin as DATA (slots 5/6 of the params vec):
    oy = pr[0, 6]    # the sharded renderer passes each device's slab origin
    h2 = h * h
    cs = grid.cell_size
    npp = P * P
    nxp = grid.nx_pad
    shape = (tb, npp, nxp)

    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    # pixel world coords: sublane s = sy*P + sx subpixel of the cell
    px = ox + (lane.astype(jnp.float32) - 1.0) * cs \
        + ((sub % P).astype(jnp.float32) + 0.5) * (cs / P)
    py = oy \
        + ((r + 1) * tb + rowi - grid.row0).astype(jnp.float32) * cs \
        + ((sub // P).astype(jnp.float32) + 0.5) * (cs / P)

    # kj outer, rolls shared across the free leading-dim row shifts — the
    # same nest as the solver stencils (models/pallas_solver.py)
    kmax = jnp.maximum(jnp.maximum(occ[0, r], occ[1, r]), occ[2, r])

    def body(kj, rho):
        xkf = xs[:, pl.ds(kj, 1), :]
        ykf = ys[:, pl.ds(kj, 1), :]
        for dx in (-1, 0, 1):
            rxf = xkf if dx == 0 else jnp.roll(xkf, -dx, axis=-1)
            ryf = ykf if dx == 0 else jnp.roll(ykf, -dx, axis=-1)
            for dy in (-1, 0, 1):
                rx = jax.lax.slice_in_dim(rxf, 1 + dy, 1 + dy + tb, axis=0)
                ry = jax.lax.slice_in_dim(ryf, 1 + dy, 1 + dy + tb, axis=0)
                ddx = px - rx
                ddy = py - ry
                r2 = ddx * ddx + ddy * ddy
                d = jnp.maximum(h2 - r2, 0.0)
                rho = rho + d * d * d
        return rho
    rho = jax.lax.fori_loop(0, kmax, body, jnp.zeros(shape, jnp.float32))

    out_ref[...] = rho * (m * 4.0 / (jnp.pi * (h2 * h2) * (h2 * h2)))


def field_density_pallas(xd: jax.Array, yd: jax.Array, params: FluidParams,
                         grid, px_per_cell: int = 2,
                         interpret: bool | None = None,
                         origin=None) -> jax.Array:
    """``field_density`` as one fused Pallas stencil kernel; same contract
    (float[ny*P, nx*P], world orientation), results identical up to f32
    summation order.  ``origin`` overrides the grid's static world origin
    with traced values (the sharded renderer passes each device's slab
    origin, like the solver stencils' binning does)."""
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..models.pallas_solver import _interpret_default
    from ..ops.reslot import block_kmax3

    if interpret is None:
        interpret = _interpret_default()
    if origin is None:
        origin = (grid.origin_x, grid.origin_y)
    P = px_per_cell
    tb = grid.row_block
    npp = P * P
    kernel = functools.partial(_field_kernel, tb=tb, P=P, grid=grid)
    slab = pltpu.VMEM((tb + 2, grid.cap, grid.nx_pad), jnp.float32)
    occ = block_kmax3(xd, grid)
    pvec = jnp.stack([
        jnp.asarray(params.h, jnp.float32),
        jnp.asarray(params.m, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.asarray(origin[0], jnp.float32),
        jnp.asarray(origin[1], jnp.float32),
        jnp.float32(0.0)]).reshape(1, 8)
    out = pl.pallas_call(
        kernel,
        grid=(grid.n_row_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, grid.n_row_blocks), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, npp, grid.nx_pad),
                               lambda r: (r + 1, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid.ny_pad, npp, grid.nx_pad),
                                       jnp.float32),
        scratch_shapes=[slab, slab,
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pvec, occ, xd, yd)

    ny, nx = grid.ny, grid.nx
    real = jax.lax.slice(out, (grid.row0, 0, 1), (grid.row0 + ny, npp,
                                                  1 + nx))
    # sublane s = sy*P + sx  ->  img[y*P+sy, x*P+sx]
    return real.reshape(ny, P, P, nx).transpose(0, 1, 3, 2).reshape(
        ny * P, nx * P)


def field_render(xd: jax.Array, yd: jax.Array, params: FluidParams, grid,
                 px_per_cell: int = 2, mode: str = "density",
                 rho_lo: float | None = None,
                 rho_hi: float | None = None,
                 use_pallas: bool = True) -> jax.Array:
    """Density-field frame: float [H, W, 3] in [0, 1], row 0 = bottom.
    Normalization bounds default to the frame's own min/max over wet pixels
    (the reference normalized per frame too, sph2d_cpu_demo.rs:155-165)."""
    planes = _field_planes(xd, yd, params, grid, px_per_cell, mode,
                           rho_lo, rho_hi, use_pallas)
    return jnp.stack(planes, axis=-1)


def _field_planes(xd, yd, params, grid, px_per_cell, mode,
                  rho_lo, rho_hi, use_pallas):
    """Planar (r, g, b) float field frame (see _colormap_planes for why)."""
    if use_pallas:
        rho = field_density_pallas(xd, yd, params, grid, px_per_cell)
    else:
        rho = field_density(xd, yd, params, grid, px_per_cell)
    wet = rho > 0.05 * params.rho_0
    if mode == "const":
        return [jnp.where(wet, c, 0.0) for c in CYAN]
    lo = rho_lo if rho_lo is not None else jnp.min(
        jnp.where(wet, rho, jnp.inf))
    hi = rho_hi if rho_hi is not None else jnp.max(rho)
    inv = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return [jnp.where(wet, p, 0.0)
            for p in _colormap_planes((rho - lo) * inv)]


def field_frame(xd: jax.Array, yd: jax.Array, params: FluidParams, grid,
                px_per_cell: int = 2, mode: str = "density",
                rho_lo: float | None = None, rho_hi: float | None = None,
                use_pallas: bool = True) -> jax.Array:
    """Finished uint8 frame [H, W, 3] (row 0 = TOP) straight from the dense
    state — the production streaming path.  Fully planar: quantization and
    the row flip happen per [H, W] channel; the only channels-last array
    ever materialized is the final uint8 stack (a float [H, W, 3]
    intermediate plus lane-3 clip/cast costs ~2 ms/frame at 1M)."""
    planes = _field_planes(xd, yd, params, grid, px_per_cell, mode,
                           rho_lo, rho_hi, use_pallas)
    u8 = [jnp.clip(p * 255.0 + 0.5, 0, 255).astype(jnp.uint8)[::-1]
          for p in planes]
    return jnp.stack(u8, axis=-1)
