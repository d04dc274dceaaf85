"""Multi-chip on-device rendering: per-slab field raster strips.

Round-2 gap #3: the sharded path had no frame story — visualizing a
multi-chip run meant extracting every particle to host, which is exactly
the readback bridge (reference: src/gpu/buffers.rs:554-617,
examples/gpu_demo.rs:58-148) this design exists to delete.  Here each
device rasterizes ITS OWN slab of the density field straight from the
resident dense state (render/raster.field_density_pallas on the local
grid), the colormap normalization bounds are psum'd across the mesh
(lax.pmin/pmax over the slab axis — two scalars of ICI traffic), and the
finished uint8 strips concatenate along the image width via the shard_map
output spec.  Only the assembled RGB frame ever reaches the host; particle
state never moves.

Ghost columns are refreshed from the neighbours before rasterizing (one
ppermute pair per position field) so slab-edge pixels see cross-boundary
particles — without this, each strip would miss the neighbour's particles
within h of the boundary and the seam would be visible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.params import FluidParams
from ..ops.binning import FAR
from ..render.raster import CYAN, _colormap_planes, field_density_pallas
from . import shard as sh

AXIS = sh.AXIS


def make_sharded_frame(params: FluidParams, spec: sh.ShardSpec, mesh: Mesh,
                       px_per_cell: int = 2, mode: str = "density",
                       interpret: bool | None = None):
    """Returns a jitted ``frame_fn(sim: ShardedDenseSim) -> uint8 [H, W, 3]``
    (row 0 = TOP, like the single-chip ``field_frame``), W spanning all
    D * nx_local real cell columns.  Composable under an outer jit with the
    sharded step for a fused step+render dispatch."""
    g = spec.local_grid
    D = spec.n_devices
    nxl = spec.nx_local
    Ppx = px_per_cell

    def local_frame(xd, yd):
        xd = xd.reshape(xd.shape[1:])
        yd = yd.reshape(yd.shape[1:])
        # refresh ghost columns: slab-edge pixels need neighbour particles
        xd, yd = sh._fill_ghost_cols_multi((xd, yd), nxl, D, (FAR, FAR))
        d = jax.lax.axis_index(AXIS)
        origin = (spec.global_x0 + d.astype(jnp.float32) * spec.slab_width,
                  g.origin_y)
        rho = field_density_pallas(xd, yd, params, g, Ppx, interpret,
                                   origin=origin)
        wet = rho > 0.05 * params.rho_0
        if mode == "const":
            planes = [jnp.where(wet, c, 0.0) for c in CYAN]
        else:
            # global normalization: the frame must be seamless across slabs
            lo = jax.lax.pmin(
                jnp.min(jnp.where(wet, rho, jnp.inf)), AXIS)
            hi = jax.lax.pmax(jnp.max(rho), AXIS)
            inv = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
            planes = [jnp.where(wet, p, 0.0)
                      for p in _colormap_planes((rho - lo) * inv)]
        u8 = [jnp.clip(p * 255.0 + 0.5, 0, 255).astype(jnp.uint8)[::-1]
              for p in planes]
        return jnp.stack(u8, axis=-1)        # [H, nxl*Ppx, 3]

    framed = jax.shard_map(
        local_frame, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(None, AXIS, None),       # strips concat along width
        check_vma=False)

    @jax.jit
    def frame_fn(sim):
        return framed(sim.xd, sim.yd)

    return frame_fn
