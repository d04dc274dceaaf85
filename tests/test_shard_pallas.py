"""Sharded solver with the Pallas stencils (interpret mode on CPU):
the exact kernel+halo combination that runs on real multi-chip hardware."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import pallas_solver
from bevy_gpu_fluid_tpu.parallel import shard


def test_sharded_pallas_matches_sharded_xla():
    params = FluidParams.demo()
    cfg = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
    spec = shard.ShardSpec.build(h=0.045, x_min=-1.0, x_max=2.5, y_max=3.0,
                                 n_devices=4, capacity=512)
    mesh = shard.make_mesh(4)

    step_xla = shard.make_sharded_step(params, cfg, spec, mesh)
    step_pls = shard.make_sharded_step(
        params, cfg, spec, mesh,
        stencils=pallas_solver.make_stencils(spec.local_grid, interpret=True))

    state = init_grid(16, 16, 0.04)
    a = shard.shard_state(state, spec)
    b = shard.shard_state(state, spec)
    for _ in range(5):
        a, da = step_xla(a)
        b, db = step_pls(b)
    assert int(da.alive_count.sum()) == int(db.alive_count.sum()) == state.n
    live = np.asarray(a.alive)
    np.testing.assert_allclose(np.asarray(a.x)[live], np.asarray(b.x)[live],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.rho)[live],
                               np.asarray(b.rho)[live], rtol=1e-5)
