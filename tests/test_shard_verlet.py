"""Multi-chip verlet (deferred rebinning on slabs): parity vs the eager
sharded solver and conservation under cross-slab flow."""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)


@pytest.fixture(scope="module")
def setup():
    # verlet needs a skin: build the spec on 1.5h cells
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=4, capacity=1024)
    mesh = shard.make_mesh(4)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        PARAMS, CFG, spec, mesh)
    # eager truth on the SAME (skinned) grid geometry
    eager = shard.make_sharded_step(PARAMS, CFG, spec, mesh)
    return spec, init_fn, step_fn, eager


def test_matches_eager_sharded(setup):
    spec, init_fn, step_fn, eager = setup
    state = init_grid(24, 24, 0.04)
    n = state.n

    ss = shard.shard_state(state, spec)
    sim = init_fn(ss)
    for _ in range(25):
        sim = step_fn(sim)
    assert int(sim.overflow.sum()) == 0
    assert int(sim.dropped.sum()) == 0

    se = shard.shard_state(state, spec)
    for _ in range(25):
        se, diag = eager(se)
    assert int(diag.dropped.sum()) == 0

    v = shard_verlet.extract_state(sim, spec, PARAMS)
    live_v = np.asarray(v.alive)
    live_e = np.asarray(se.alive)
    assert int(live_v.sum()) == int(live_e.sum()) == n

    # identity-free comparison: nearest-neighbour positions + rho
    from scipy.spatial import cKDTree
    a = np.stack([np.asarray(v.x)[live_v], np.asarray(v.y)[live_v]], -1)
    b = np.stack([np.asarray(se.x)[live_e], np.asarray(se.y)[live_e]], -1)
    dist, j = cKDTree(b).query(a, k=1)
    assert dist.max() <= 5.448e-3   # reference's 100-step drift bar
    rho_a = np.asarray(v.rho)[live_v]
    rho_b = np.asarray(se.rho)[live_e][j]
    assert (np.abs(rho_a - rho_b) / rho_b).max() <= 0.01


def test_cross_slab_flow_conserves(setup):
    spec, init_fn, step_fn, _ = setup
    state = init_grid(12, 12, 0.04)
    state = state.replace(vx=jnp.full((state.n,), 4.0))
    sim = init_fn(shard.shard_state(state, spec))
    for _ in range(80):
        sim = step_fn(sim)
    assert int(sim.dropped.sum()) == 0
    assert int(jnp.sum(sim.alive)) == state.n
    assert int(sim.rebin_count.max()) > 1   # migration actually happened
    v = shard_verlet.extract_state(sim, spec, PARAMS)
    live = np.asarray(v.alive)
    assert np.isfinite(np.asarray(v.x)[live]).all()
    # the block moved right across slabs
    assert float(np.asarray(v.x)[live].mean()) > float(jnp.mean(state.x))