"""Plane-at-a-time ("planar") rebin: bitwise equivalence with the fused path.

The planar pipeline (ops/reslot.py select + per-plane apply + code-based
recovery collect) exists purely for HBM-peak liveness at ceiling particle
counts (the fused rebin's ~13 plane-footprints faulted at 128M) — it must
be INVISIBLE in results.  These tests pin:

* the routing kernels alone reproduce the fused reslot bit-for-bit,
* the taken-mask (code-based drop detection) matches post-plane membership,
* full planar steps — rebins, overflow recovery collect/admit included —
  produce bitwise-identical DenseSims to the fused step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import verlet_solver
from bevy_gpu_fluid_tpu.ops import reslot
from bevy_gpu_fluid_tpu.ops.binning import FAR, bin_particles, to_dense

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5, bounce=-0.5)
GRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                  skin_factor=1.5)


def _make_perturbed(grid):
    state = init_grid(20, 20, 0.04)
    n = state.n
    sim = verlet_solver.init_dense(state, grid)
    key = jax.random.PRNGKey(7)
    d = jax.random.uniform(key, (2, n), minval=-1.0, maxval=1.0)
    skin_half = (grid.cell_size - 0.045) * 0.5
    x2 = state.x + d[0] * skin_half * 0.95
    y2 = jnp.maximum(state.y + d[1] * skin_half * 0.95, 0.0)
    b = bin_particles(state.x, state.y, grid, with_csr=False)
    xd = to_dense(b, x2, fill=FAR)
    yd = to_dense(b, y2, fill=FAR)
    vxd = to_dense(b, jnp.arange(n, dtype=jnp.float32), fill=0.0)
    vyd = to_dense(b, -jnp.arange(n, dtype=jnp.float32), fill=0.0)
    return xd, yd, vxd, vyd, sim.idx_d


@pytest.fixture(scope="module")
def perturbed_dense():
    return _make_perturbed(GRID)


def test_reslot_planar_bitwise(perturbed_dense):
    xd, yd, vxd, vyd, idx_d = perturbed_dense
    fused = reslot.reslot_pallas(xd, yd, vxd, vyd, idx_d, GRID)
    planar = reslot.reslot_planar(xd, yd, vxd, vyd, idx_d, GRID)
    for name, a, b in zip(("xd", "yd", "vxd", "vyd", "idx", "cnt"),
                          fused, planar):
        assert bool(jnp.array_equal(a, b)), name


def test_reslot_tb4_matches_xla():
    """4-row blocks (wide-grid mode) through BOTH rebin paths.  Regression:
    the per-cell count used to come back through a (tb, nx_pad) output
    block, whose sublane dim (tb=4) violates Mosaic's divisible-by-8 rule
    — the 144M hw run faulted at its first planar rebin.  Counts now ride
    a [n_row_blocks, max(8, tb), nx_pad] block (full last-two dims, legal
    at any tb); this pins the re-laid plane against the XLA reference."""
    g4 = dataclasses.replace(GRID, row_block=4)
    xd, yd, vxd, vyd, idx_d = _make_perturbed(g4)
    ref = reslot.reslot_xla(xd, yd, vxd, vyd, idx_d, g4)
    fused = reslot.reslot_pallas(xd, yd, vxd, vyd, idx_d, g4)
    planar = reslot.reslot_planar(xd, yd, vxd, vyd, idx_d, g4)
    # XLA writes candidate counts into ghost rows too; the kernels only
    # write interior blocks — compare there (nothing reads ghost counts)
    tb = g4.row_block
    for name, a, b, c in zip(("xd", "yd", "vxd", "vyd", "idx", "cnt"),
                             ref, fused, planar):
        a = a[tb:-tb] if name == "cnt" else a
        assert bool(jnp.array_equal(a, b[tb:-tb] if name == "cnt"
                                    else b)), f"fused {name}"
        assert bool(jnp.array_equal(a, c[tb:-tb] if name == "cnt"
                                    else c)), f"planar {name}"
    # the count block's sublane height is Mosaic-legal for every row_block
    for tb_ in (4, 8, 16):
        assert reslot._cnt_rows(tb_) % 8 == 0


def test_taken_mask_matches_post_membership(perturbed_dense):
    xd, yd, vxd, vyd, idx_d = perturbed_dense
    occ = reslot.block_kmax3(xd, GRID)
    code, _ = reslot.select_pallas(xd, yd, GRID, occ=occ)
    post_idx = reslot.reslot_pallas(xd, yd, vxd, vyd, idx_d, GRID)[4]
    taken = np.asarray(reslot.taken_mask(code, GRID.cap))
    pidx = np.asarray(idx_d)
    post_ids = set(np.unique(np.asarray(post_idx))) - {-1}
    live = pidx >= 0
    # every live pre-slot is taken iff its particle survived into the post
    # planes (the exact drop criterion the fused recovery collect uses)
    expect = np.isin(pidx, sorted(post_ids)) & live
    assert (taken[live] == expect[live]).all()


def _run(state, grid, n_rec, steps, planar):
    stepf = verlet_solver.make_step(PARAMS, CFG, grid, n=n_rec,
                                    planar=planar)
    sim = jax.jit(lambda s: verlet_solver.init_dense(
        s, grid, collect_spill=n_rec is not None))(state)
    run = jax.jit(lambda s: jax.lax.scan(
        lambda c, _: (stepf(c), None), s, None, length=steps)[0])
    return run(sim)


def _assert_sims_equal(a, b):
    for f in dataclasses.fields(verlet_solver.DenseSim):
        assert bool(jnp.array_equal(getattr(a, f.name),
                                    getattr(b, f.name))), f.name


def test_planar_step_bitwise_with_recovery():
    # normal scene: rebins fire, overflow 0 (recovery conds stay cold)
    state = init_grid(20, 20, 0.04)
    a = _run(state, GRID, state.n, 60, planar=False)
    b = _run(state, GRID, state.n, 60, planar=True)
    assert int(a.rebin_count) >= 2
    _assert_sims_equal(a, b)

    # crowded scene: drop -> suspend -> re-admit churn exercises the planar
    # collect (taken_mask) + admit conds against the fused _spill_recover
    state2 = init_grid(3, 3, 0.004)
    a2 = _run(state2, GRID, state2.n, 60, planar=False)
    b2 = _run(state2, GRID, state2.n, 60, planar=True)
    assert int(a2.overflow) >= 1 and int(a2.readmitted) >= 1
    _assert_sims_equal(a2, b2)


def test_planar_auto_threshold():
    # the demo grid is far below the HBM ceiling: auto stays fused
    assert not verlet_solver.planar_rebin_default(GRID)
    sess = verlet_solver.Session(init_grid(4, 4, 0.04), PARAMS, CFG, GRID)
    assert sess.planar_rebin is False
    # a ceiling-scale grid flips it (128M-bench shape: nx_pad ~5888)
    big = dataclasses.replace(GRID, nx=5800, ny=6460)
    assert verlet_solver.planar_rebin_default(big)
