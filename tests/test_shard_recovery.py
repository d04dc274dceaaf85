"""Sharded overflow recovery: spill + skin-gated re-admission at collective
rebins (parallel/shard_verlet.py with ``n`` passed).

Mirrors tests/test_overflow.py's single-chip recovery gates on a D=2 mesh:
an overfilled cell on slab 0 (9 coincident particles, cap 8) drops one at
the init sort into device 0's spill buffer; the other 8 blast apart
(enormous EOS pressure), collective rebins fire, the cell frees up, and the
suspended particle re-admits — while a plain block on slab 1 keeps both
devices populated.  Conservation is exact throughout: every original index
is resident or suspended, nothing surfaces as FAR.
"""

import jax
import jax.numpy as jnp
import numpy as np

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.core.state import from_positions
from bevy_gpu_fluid_tpu.ops.binning import FAR
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet

PARAMS = bgf.FluidParams.demo()
CFG = bgf.IntegrateConfig.create(x_min=-1.0, x_max=2.5, bounce=-0.5)
STEPS = 30


def scene():
    # 3x3 crowd at 0.004 spacing near (0.2, 0.05) — one 0.0675 cell, slab 0
    cx, cy = np.meshgrid(np.arange(3) * 0.004 + 0.2,
                         np.arange(3) * 0.004 + 0.05)
    # 4x2 block at 0.06 spacing (> h: inert) near x=1.5 — slab 1 stays
    # populated
    bx, by = np.meshgrid(np.arange(4) * 0.06 + 1.5,
                         np.arange(2) * 0.06 + 0.03)
    pos = np.concatenate([np.stack([cx.ravel(), cy.ravel()], -1),
                          np.stack([bx.ravel(), by.ravel()], -1)])
    return from_positions(jnp.asarray(pos, jnp.float32))


def test_sharded_recovery_conserves_and_readmits():
    state = scene()
    n = state.n
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=2, capacity=512)
    mesh = shard.make_mesh(2)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        PARAMS, CFG, spec, mesh, n=n)

    sim = init_fn(shard.shard_state(state, spec))
    # the init sort dropped one of the 9 coincident particles into the
    # spill buffer of its device — counted AND suspended, not gone
    assert int(sim.overflow.max()) == 1
    assert int(sim.suspended) == 1
    fs0 = shard_verlet.extract_fluid_state(sim, spec, PARAMS, n)
    assert bool((fs0.x < FAR * 0.5).all())

    for _ in range(STEPS):
        sim = step_fn(sim)
        jax.block_until_ready(sim.xd)   # 1-core rig: one exec in flight

    # recovery happened: the suspended particle re-admitted once its cell
    # freed (the other 8 blasted apart)
    assert int(sim.readmitted.sum()) >= 1

    # conservation: every particle resident or suspended-at-position
    fs = shard_verlet.extract_fluid_state(sim, spec, PARAMS, n)
    assert bool((fs.x < FAR * 0.5).all())
    assert bool(jnp.isfinite(fs.x).all() & jnp.isfinite(fs.vx).all())

    # identity: resident idx planes + spill idx together hold each original
    # index at most once, and all n exactly once
    ids = np.concatenate([np.asarray(sim.idx_d).reshape(-1),
                          np.asarray(sim.sidx).reshape(-1)])
    ids = np.sort(ids[ids >= 0])
    np.testing.assert_array_equal(ids, np.arange(n))


def test_sharded_recovery_off_is_bitwise_old_behavior():
    """Without ``n``, the spill machinery is dormant: drops are counted,
    spill stays empty, extraction surfaces dropped particles as FAR — the
    pre-recovery contract (and the configuration every pre-existing
    multi-chip test runs)."""
    state = scene()
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=2, capacity=512)
    mesh = shard.make_mesh(2)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        PARAMS, CFG, spec, mesh)
    sim = init_fn(shard.shard_state(state, spec))
    assert int(sim.overflow.max()) == 1
    assert int(sim.suspended) == 0
    for _ in range(5):
        sim = step_fn(sim)
        jax.block_until_ready(sim.xd)
    assert int(sim.readmitted.sum()) == 0
    assert int(sim.suspended) == 0
    fs = shard_verlet.extract_fluid_state(sim, spec, PARAMS, state.n)
    # every disappearance surfaces as FAR and is exactly accounted by the
    # loss counters (capacity + window losses of the violent blast)
    n_far = int(jnp.sum(fs.x > FAR * 0.5))
    counted = int(sim.overflow.sum() + sim.lost.sum() + sim.dropped.sum())
    assert n_far == counted >= 1
