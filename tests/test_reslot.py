"""Dense local rebin (ops/reslot.py): equivalence with sort-based binning.

After perturbing positions by less than the Verlet skin, reslotting the
dense state must place exactly the same particle set into exactly the same
cells as a from-scratch sort-based rebin (within-cell ORDER may differ — the
sort orders by original index, reslot by candidate enumeration — which is
fine: order only permutes f32 summation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, init_grid
from bevy_gpu_fluid_tpu.models import verlet_solver
from bevy_gpu_fluid_tpu.ops import reslot
from bevy_gpu_fluid_tpu.ops.binning import FAR, bin_particles, to_dense

PARAMS = FluidParams.demo()
GRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                  skin_factor=1.5)


def cell_sets(idx_d, cx_of):
    """{cell: frozenset(particle ids)} from a dense idx field."""
    idx = np.asarray(idx_d)
    out = {}
    for (r, k, c), v in np.ndenumerate(idx):
        if v >= 0:
            out.setdefault((r, c), set()).add(int(v))
    return out


@pytest.fixture(scope="module")
def perturbed():
    state = init_grid(24, 24, 0.04)
    n = state.n
    sim = verlet_solver.init_dense(state, GRID)
    # perturb every particle by < skin_half in a deterministic pattern that
    # moves many across cell boundaries' vicinity
    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (2, n), minval=-1.0, maxval=1.0)
    skin_half = (GRID.cell_size - 0.045) * 0.5
    x2 = state.x + d[0] * skin_half * 0.95
    y2 = jnp.maximum(state.y + d[1] * skin_half * 0.95, 0.0)
    # write the perturbed positions into the FROZEN slots (what the verlet
    # integrator does between rebins)
    b = bin_particles(state.x, state.y, GRID, with_csr=False)
    xd = to_dense(b, x2, fill=FAR)
    yd = to_dense(b, y2, fill=FAR)
    vxd = to_dense(b, jnp.arange(n, dtype=jnp.float32), fill=0.0)
    vyd = to_dense(b, -jnp.arange(n, dtype=jnp.float32), fill=0.0)
    return state, x2, y2, xd, yd, vxd, vyd, sim.idx_d


def test_reslot_xla_matches_fresh_binning(perturbed):
    state, x2, y2, xd, yd, vxd, vyd, idx_d = perturbed
    n = state.n
    ox, oy, ovx, ovy, oi, cnt = reslot.reslot_xla(xd, yd, vxd, vyd, idx_d,
                                                  GRID)
    # same per-cell particle sets as a from-scratch sort-based rebin
    b2 = bin_particles(x2, y2, GRID, with_csr=False)
    idx2_d = to_dense(b2, jnp.arange(n, dtype=jnp.int32), fill=-1)
    assert int(b2.overflow) == 0
    assert cell_sets(oi, GRID) == cell_sets(idx2_d, GRID)
    # every particle captured exactly once, nothing lost
    assert int(jnp.sum(cnt)) == n
    ids = np.sort(np.asarray(oi)[np.asarray(oi) >= 0])
    np.testing.assert_array_equal(ids, np.arange(n))
    # values rode along with their ids
    oi_np = np.asarray(oi)
    live = oi_np >= 0
    np.testing.assert_allclose(np.asarray(ox)[live],
                               np.asarray(x2)[oi_np[live]], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ovx)[live],
                               oi_np[live].astype(np.float32))


def test_reslot_pallas_matches_xla(perturbed):
    _, _, _, xd, yd, vxd, vyd, idx_d = perturbed
    a = reslot.reslot_xla(xd, yd, vxd, vyd, idx_d, GRID)
    b = reslot.reslot_pallas(xd, yd, vxd, vyd, idx_d, GRID, interpret=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_reslot_drops_far_and_counts_overflow():
    # a deliberately overcrowded cell: 9 particles in one 0.0675 cell
    state = init_grid(3, 3, 0.004)
    n = state.n
    sim = verlet_solver.init_dense(state, GRID)   # sort path drops 1
    ox, oy, ovx, ovy, oi, cnt = reslot.reslot_xla(
        sim.xd, sim.yd, sim.vxd, sim.vyd, sim.idx_d, GRID)
    # the 8 slotted particles re-capture; counts expose no phantom matches
    assert int(jnp.sum(cnt)) == 8
    assert int(jnp.sum(jnp.minimum(cnt, GRID.cap))) == 8
    # FAR slots (the dropped particle never had one) stay dead
    assert int(jnp.sum(oi >= 0)) == 8
