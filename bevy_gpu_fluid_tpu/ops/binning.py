"""Sort-based spatial-hash binning.

TPU-native replacement for the reference's entire GPU grid builder — the
8-pass atomic counting-sort pipeline (clear_counts / histogram / block_scan /
block_sums_scan / add_back / write_sentinel / clear_cursor / scatter,
reference: assets/shaders/grid_build.wgsl + src/gpu/grid_build.rs, ~980 LoC)
and the per-frame CPU CSR rebuild (reference: src/gpu/buffers.rs:395-448).

The structure mirrors the reference's counting sort, re-expressed for XLA:
a stable ``argsort`` orders particles by cell id, within-cell ranks fall out
of a segment-relative cummax over the sorted ids, and one scatter returns
the ranks to original particle order.  Everything else — the dense-slot
scatter and the per-particle gather-back — is indexed in ORIGINAL particle
order (cell coords are elementwise; only the rank needs the sort), so the
hot path runs exactly one sort, one rank-unsort scatter, one dense scatter
per field, and one (multi-field fused) gather back.  Random-access ops at
millions of particles are the step's true cost on TPU; this layout minimizes
their count.

Two wins over the reference by construction:

* fully deterministic within-cell order — the reference's atomic scatter
  order was nondeterministic (grid_build.wgsl:234-236, an acknowledged
  defect);
* no dynamic allocation: the grid is static (shapes fixed under jit), where
  the reference recomputed an AABB + grid dims on the host every frame.

Cell convention matches the reference: cell = floor((pos - origin) / h), and
out-of-domain coordinates clamp into the boundary cells, which is safe
because every pair interaction is re-gated by r^2 < h^2 (the reference clamps
its histogram index identically, grid_build.wgsl:57-66).

Dense layout (chosen for the TPU memory system): ``[ny_pad, cap, nx_pad]`` —
the x-column axis is LAST so it maps onto the 128 vector lanes, and ``cap``
(default 8) maps onto the f32 sublanes, giving exactly one (8, 128) register
tile per row-chunk of cells.  Guaranteed-empty ghost rows/columns surround
the real grid (see GridSpec2D.row0/ny_pad/nx_pad) so stencil kernels can
shift by +-1 in either axis — wraparound and block taps only ever touch
empty ghosts.  Empty slots are not masked but *sentineled*: position fields
fill with FAR = 1e9 so every pair test against an empty slot fails the
r^2 < h^2 gate for free.

Particles beyond ``cap`` in an overcrowded cell overflow (dropped from the
dense view); ``overflow`` counts them for diagnostics.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import GridSpec2D

FAR = 1.0e9  # empty-slot sentinel for position fields


@partial(jax.tree_util.register_dataclass,
         data_fields=("cx", "cy", "rank", "perm", "inv_perm", "sorted_cell",
                      "sorted_rank", "starts", "counts", "overflow"),
         meta_fields=("grid",))
@dataclasses.dataclass
class Binned:
    """Result of binning N particles into a static grid of C = nx*ny cells.

    Original-order (the hot-path views):
      cx, cy:    int32[N] clamped cell coords per particle
      rank:      int32[N] within-cell rank (stable original-index order)
    Sorted-order (kept for CSR consumers; cheap by-products of the sort):
      perm:        int32[N] original index of the i-th sorted particle
      sorted_cell: int32[N] cell id per sorted slot (ascending)
      sorted_rank: int32[N]
    Optional (with_csr=True), else None:
      inv_perm:  int32[N] sorted position of original particle i
      starts:    int32[C+1] CSR starts into sorted order (starts[C] == #alive)
      counts:    int32[C]
    overflow:    int32 scalar — number of particles with rank >= cap
    """

    cx: jax.Array
    cy: jax.Array
    rank: jax.Array
    perm: jax.Array
    inv_perm: jax.Array | None
    sorted_cell: jax.Array
    sorted_rank: jax.Array
    starts: jax.Array | None
    counts: jax.Array | None
    overflow: jax.Array
    grid: GridSpec2D


def cell_coords(x: jax.Array, y: jax.Array, grid: GridSpec2D,
                origin=None) -> tuple[jax.Array, jax.Array]:
    """Clamped integer cell coordinates for component position arrays [N].

    ``origin`` optionally overrides the grid's static origin with traced
    values — used by the sharded solver, where each device's slab origin is a
    function of its mesh coordinate."""
    ox, oy = origin if origin is not None else (grid.origin_x, grid.origin_y)
    inv = 1.0 / grid.cell_size
    cx = jnp.floor((x - ox) * inv).astype(jnp.int32)
    cy = jnp.floor((y - oy) * inv).astype(jnp.int32)
    return jnp.clip(cx, 0, grid.nx - 1), jnp.clip(cy, 0, grid.ny - 1)


def cell_ids(x: jax.Array, y: jax.Array, grid: GridSpec2D,
             origin=None) -> jax.Array:
    """Linear cell id = cx + cy * nx (reference: sph_density.wgsl:108-110)."""
    cx, cy = cell_coords(x, y, grid, origin)
    return cx + cy * grid.nx


def bin_particles(x: jax.Array, y: jax.Array, grid: GridSpec2D,
                  alive: jax.Array | None = None, origin=None,
                  with_csr: bool = True) -> Binned:
    """Bin N particles.

    ``alive=False`` slots (fixed-capacity sharded buffers) go to a void cell
    id == num_cells: they sort to the end, never enter real cells, and their
    dense writes land in ghost rows (callers keep dead position fields at
    FAR, so those writes are indistinguishable from the FAR fill).

    ``with_csr=False`` skips the per-cell histogram + prefix sum and the
    inverse permutation (none of which the solvers need)."""
    n = x.shape[0]
    cx, cy = cell_coords(x, y, grid, origin)
    cid = cx + cy * grid.nx
    if alive is not None:
        cid = jnp.where(alive, cid, grid.num_cells)
        cx = jnp.where(alive, cx, 0)
        cy = jnp.where(alive, cy, grid.ny)  # ghost row (see class docstring)
    perm = jnp.argsort(cid, stable=True)          # deterministic within-cell
    sorted_cell = cid[perm]

    # rank within cell: position minus the running start of its segment,
    # then one scatter back to original order
    pos = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, pos, -1))
    sorted_rank = pos - seg_start
    rank = jnp.zeros((n,), jnp.int32).at[perm].set(sorted_rank)
    overflow = jnp.sum((sorted_rank >= grid.cap)
                       & (sorted_cell < grid.num_cells)).astype(jnp.int32)

    if with_csr:
        inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(pos)
        # the reference's histogram + 5-pass prefix scan, as two XLA ops
        counts = jnp.zeros((grid.num_cells,), jnp.int32).at[cid].add(
            1, mode="drop")
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts, dtype=jnp.int32)])
    else:
        inv_perm = counts = starts = None
    return Binned(cx=cx, cy=cy, rank=rank, perm=perm, inv_perm=inv_perm,
                  sorted_cell=sorted_cell, sorted_rank=sorted_rank,
                  starts=starts, counts=counts, overflow=overflow, grid=grid)


def sort_field(binned: Binned, field: jax.Array) -> jax.Array:
    """Permute a per-particle field into sorted (cell-contiguous) order."""
    return field[binned.perm]


def _scatter_coords(binned: Binned):
    g = binned.grid
    # rank >= cap -> out-of-bounds sublane -> dropped by scatter mode="drop"
    rk = jnp.where(binned.rank < g.cap, binned.rank, g.cap + (1 << 20))
    return binned.cy + g.row0, rk, binned.cx + 1


def to_dense(binned: Binned, field: jax.Array, fill: float = 0.0) -> jax.Array:
    """Scatter a per-particle field [N] (ORIGINAL order) into dense cell
    slots [ny_pad, cap, nx_pad]; empty slots (and the ghost border) hold
    ``fill``.  Target slots are unique by construction, so the scatter is
    deterministic (unlike the reference's atomic scatter,
    grid_build.wgsl:224-243)."""
    g = binned.grid
    cy, rk, cx = _scatter_coords(binned)
    base = jnp.full((g.ny_pad, g.cap, g.nx_pad), fill, field.dtype)
    return base.at[cy, rk, cx].set(field, mode="drop")


def from_dense(binned: Binned, dense: jax.Array,
               fallback: jax.Array | float = 0.0) -> jax.Array:
    """Read per-particle values (ORIGINAL order) back out of a dense
    [ny_pad, cap, nx_pad] result.  Overflowed particles (rank >= cap) get
    ``fallback``."""
    return from_dense_multi(binned, [dense], [fallback])[0]


def from_dense_multi(binned: Binned, denses, fallbacks):
    """Gather SEVERAL dense fields per particle with ONE fused gather —
    random-access cost on TPU is per-index, not per-byte, so stacking fields
    on the trailing axis reads k fields for the price of one."""
    return gather_slots(binned.grid, binned.cx, binned.cy, binned.rank,
                        denses, fallbacks)


def gather_slots(grid: GridSpec2D, cx, cy, rank, denses, fallbacks):
    """from_dense_multi on raw slot coordinates (used by solvers that freeze
    the slot assignment across steps)."""
    in_cap = rank < grid.cap
    stacked = denses[0][..., None] if len(denses) == 1 \
        else jnp.stack(denses, axis=-1)
    vals = stacked[cy + grid.row0, jnp.minimum(rank, grid.cap - 1),
                   cx + 1]                             # [N, k]
    outs = []
    for i, fb in enumerate(fallbacks):
        outs.append(jnp.where(in_cap, vals[:, i], fb))
    return outs
