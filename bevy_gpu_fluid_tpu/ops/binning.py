"""Sort-based spatial-hash binning.

TPU-native replacement for the reference's entire GPU grid builder — the
8-pass atomic counting-sort pipeline (clear_counts / histogram / block_scan /
block_sums_scan / add_back / write_sentinel / clear_cursor / scatter,
reference: assets/shaders/grid_build.wgsl + src/gpu/grid_build.rs, ~980 LoC)
and the per-frame CPU CSR rebuild (reference: src/gpu/buffers.rs:395-448).

TPUs have no global atomics, so instead of histogram+scatter we sort particle
indices by cell id (XLA's stable sort) and derive CSR starts by binary search.
Two wins over the reference by construction:

* fully deterministic within-cell order — the reference's atomic scatter order
  was nondeterministic (grid_build.wgsl:234-236, an acknowledged defect);
* no dynamic allocation: the grid is static (shapes fixed under jit), where
  the reference recomputed an AABB + grid dims on the host every frame.

Cell convention matches the reference: cell = floor((pos - origin) / h), and
out-of-domain coordinates clamp into the boundary cells, which is safe because
every pair interaction is re-gated by r^2 < h^2 (the reference clamps its
histogram index identically, grid_build.wgsl:57-66).

The dense view exposes per-cell slots [C, cap] by *gather* (not scatter):
slot (c, k) holds sorted position starts[c]+k when k < count(c).  Particles
beyond ``cap`` in an overcrowded cell overflow; ``overflow`` counts them for
diagnostics and tests assert it is zero for well-capped scenes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import GridSpec2D


@partial(jax.tree_util.register_dataclass,
         data_fields=("perm", "inv_perm", "sorted_cell", "sorted_rank",
                      "starts", "counts", "slot_idx", "slot_mask", "overflow"),
         meta_fields=("grid",))
@dataclasses.dataclass
class Binned:
    """Result of binning N particles into a static grid of C = nx*ny cells.

    perm:        int32[N]  original index of the i-th sorted particle
    inv_perm:    int32[N]  sorted position of original particle i
    sorted_cell: int32[N]  cell id per sorted slot (ascending)
    sorted_rank: int32[N]  rank within its cell per sorted slot
    starts:      int32[C+1] CSR starts into sorted order (starts[C] == N)
    counts:      int32[C]
    slot_idx:    int32[C, cap] sorted-order index per dense slot (N = empty)
    slot_mask:   bool [C, cap]
    overflow:    int32 scalar — number of particles with rank >= cap
    """

    perm: jax.Array
    inv_perm: jax.Array
    sorted_cell: jax.Array
    sorted_rank: jax.Array
    starts: jax.Array
    counts: jax.Array
    slot_idx: jax.Array
    slot_mask: jax.Array
    overflow: jax.Array
    grid: GridSpec2D


def cell_coords(pos: jax.Array, grid: GridSpec2D) -> tuple[jax.Array, jax.Array]:
    """Clamped integer cell coordinates (cx, cy) for positions [N, 2]."""
    inv = 1.0 / grid.cell_size
    cx = jnp.floor((pos[:, 0] - grid.origin_x) * inv).astype(jnp.int32)
    cy = jnp.floor((pos[:, 1] - grid.origin_y) * inv).astype(jnp.int32)
    cx = jnp.clip(cx, 0, grid.nx - 1)
    cy = jnp.clip(cy, 0, grid.ny - 1)
    return cx, cy


def cell_ids(pos: jax.Array, grid: GridSpec2D) -> jax.Array:
    """Linear cell id = cx + cy * nx (reference: sph_density.wgsl:108-110)."""
    cx, cy = cell_coords(pos, grid)
    return cx + cy * grid.nx


def bin_particles(pos: jax.Array, grid: GridSpec2D) -> Binned:
    n = pos.shape[0]
    cid = cell_ids(pos, grid)
    perm = jnp.argsort(cid, stable=True)          # deterministic within-cell
    sorted_cell = cid[perm]
    inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))

    starts = jnp.searchsorted(
        sorted_cell, jnp.arange(grid.num_cells + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    sorted_rank = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cell]

    k = jnp.arange(grid.cap, dtype=jnp.int32)
    slot_idx = starts[:-1, None] + k[None, :]          # [C, cap]
    slot_mask = k[None, :] < counts[:, None]
    slot_idx = jnp.where(slot_mask, slot_idx, n)

    overflow = jnp.sum((counts - grid.cap).clip(min=0)).astype(jnp.int32)
    return Binned(perm=perm, inv_perm=inv_perm, sorted_cell=sorted_cell,
                  sorted_rank=sorted_rank, starts=starts, counts=counts,
                  slot_idx=slot_idx, slot_mask=slot_mask, overflow=overflow,
                  grid=grid)


def sort_field(binned: Binned, field: jax.Array) -> jax.Array:
    """Permute a per-particle field into sorted (cell-contiguous) order."""
    return field[binned.perm]


def to_dense(binned: Binned, sorted_field: jax.Array,
             fill: float = 0.0) -> jax.Array:
    """Gather a sorted per-particle field [N, ...] into dense cell slots
    [ny, nx, cap, ...]; empty slots get ``fill``."""
    n = sorted_field.shape[0]
    pad = jnp.full((1,) + sorted_field.shape[1:], fill, sorted_field.dtype)
    padded = jnp.concatenate([sorted_field, pad], axis=0)
    dense = padded[binned.slot_idx]                      # [C, cap, ...]
    g = binned.grid
    return dense.reshape((g.ny, g.nx, g.cap) + sorted_field.shape[1:])


def from_dense(binned: Binned, dense: jax.Array,
               fallback: jax.Array | float = 0.0) -> jax.Array:
    """Read per-particle values (ORIGINAL order) back out of a dense
    [ny, nx, cap, ...] result.  Overflowed particles (rank >= cap) get
    ``fallback``."""
    g = binned.grid
    flat = dense.reshape((g.num_cells * g.cap,) + dense.shape[3:])
    rank = binned.sorted_rank
    in_cap = rank < g.cap
    lin = binned.sorted_cell * g.cap + jnp.minimum(rank, g.cap - 1)
    vals_sorted = flat[lin]
    if dense.ndim > 3:
        in_cap = in_cap.reshape((-1,) + (1,) * (vals_sorted.ndim - 1))
    vals_sorted = jnp.where(in_cap, vals_sorted, fallback)
    return vals_sorted[binned.inv_perm]
