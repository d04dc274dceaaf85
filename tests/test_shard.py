"""Multi-chip (virtual 8-device CPU mesh) tests for the sharded solver:
correctness vs the single-device solver, particle conservation, migration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver
from bevy_gpu_fluid_tpu.parallel import shard


@pytest.fixture(scope="module")
def setup4():
    params = FluidParams.demo()
    cfg = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
    spec = shard.ShardSpec.build(h=0.045, x_min=-1.0, x_max=2.5, y_max=3.0,
                                 n_devices=4, capacity=1024)
    mesh = shard.make_mesh(4)
    step = shard.make_sharded_step(params, cfg, spec, mesh)
    return params, cfg, spec, mesh, step


def _match_nearest(a_xy, b_xy, a_val, b_val, pos_tol, val_rtol):
    """Identity-free particle-set comparison: each particle in A must have a
    B particle within pos_tol whose value agrees to val_rtol."""
    from scipy.spatial import cKDTree
    tree = cKDTree(b_xy)
    dist, j = tree.query(a_xy, k=1)
    assert dist.max() <= pos_tol, f"worst position mismatch {dist.max():.2e}"
    rel = np.abs(a_val - b_val[j]) / np.abs(b_val[j])
    assert rel.max() <= val_rtol, f"worst rho mismatch {rel.max():.2e}"


def test_sharded_matches_single_device(setup4):
    params, cfg, spec, mesh, step = setup4
    state = init_grid(32, 32, 0.04)   # block spans 2 of 4 slabs
    n = state.n

    ss = shard.shard_state(state, spec)
    for _ in range(30):
        ss, diag = step(ss)
    assert int(diag.overflow.sum()) == 0
    assert int(diag.dropped.sum()) == 0
    assert int(diag.alive_count.sum()) == n

    # single-device truth on the identical global grid
    gglobal = spec.local_grid
    import dataclasses
    gglobal = dataclasses.replace(gglobal, nx=spec.nx_local * 4)
    single, sdiag = grid_solver.multi_step(state, params, cfg, gglobal, 30)
    assert int(sdiag.overflow) == 0

    flat = shard.unshard_state(ss)
    assert flat.n == n
    # same drift bars as the reference's 100-step integration parity
    # (docs/sprint3/sprint3.md:886-890: |dx| <= 5.448e-3)
    _match_nearest(
        np.stack([np.asarray(flat.x), np.asarray(flat.y)], -1),
        np.stack([np.asarray(single.x), np.asarray(single.y)], -1),
        np.asarray(flat.rho), np.asarray(single.rho),
        pos_tol=5.448e-3, val_rtol=0.01)
    assert bool(jnp.isfinite(flat.x).all() and jnp.isfinite(flat.y).all())


def test_migration_conserves_particles(setup4):
    params, cfg, spec, mesh, step = setup4
    state = init_grid(16, 16, 0.04)
    # fling the whole block rightward hard: it must cross slab boundaries
    state = state.replace(vx=jnp.full((state.n,), 4.0))
    ss = shard.shard_state(state, spec)
    per_dev_before = np.asarray(jnp.sum(ss.alive, axis=1))
    for _ in range(100):
        ss, diag = step(ss)
    per_dev_after = np.asarray(jnp.sum(ss.alive, axis=1))
    assert int(diag.dropped.sum()) == 0
    assert int(diag.alive_count.sum()) == state.n
    # distribution actually moved right
    assert not np.array_equal(per_dev_before, per_dev_after)
    com_x = float(jnp.sum(jnp.where(ss.alive, ss.x, 0.0)) / state.n)
    assert com_x > float(jnp.mean(state.x))


def test_shardspec_wide_local_grid_drops_row_block():
    """ShardSpec.build applies the flagship's width-adaptive row blocks:
    past ~6016 pad lanes the fused forces kernel's scoped VMEM exceeds
    the 100 MB stack at tb=8 (the 160M/device step_until compile fault
    measured 104.48M at nx_pad 6528) — wide local grids must get the
    4-row blocks exactly where default_grid does."""
    from bevy_gpu_fluid_tpu.models.pallas_solver import pick_row_block

    # ~160M-per-device footprint: one slab ~6500 cells wide
    wide = shard.ShardSpec.build(h=0.045 * 1.75, x_min=-1.0, x_max=512.0,
                                 y_max=560.0, n_devices=1, capacity=1024)
    assert wide.local_grid.nx_pad > 6016
    assert wide.local_grid.row_block == \
        pick_row_block(wide.local_grid.nx_pad) == 4

    # the published <=128M/device shapes are untouched (tb stays 8)
    narrow = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                   y_max=3.0, n_devices=2, capacity=64)
    assert narrow.local_grid.row_block == 8
