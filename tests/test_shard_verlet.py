"""Multi-chip verlet (deferred rebinning on slabs): EXACT per-particle
parity and conservation, on the shared D=4 scene (see conftest.sverlet_d4).

Round-3 upgrade: identity is tracked through migration and rebinning, so
every gate here compares particle i to particle i — the reference's own
comparison style (its parity harnesses diff by the stable SSBO array index,
reference: examples/gpu_parity10.rs:104-139) — instead of the round-2
kd-tree nearest-neighbour matching, which could not detect two particles
swapping trajectories.  The tolerances tightened accordingly: the sharded
and single-chip flagships agree to ~1e-7 (f32 summation-order noise), five
orders below the reference's 100-step drift bar of 5.448e-3."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet

from conftest import SVERLET_STEPS


def _original_order(runs, key):
    sim = runs[key]
    return shard_verlet.extract_fluid_state(sim, runs["spec"], runs["params"],
                                            runs["n"])


def test_no_losses_and_all_slabs_populated(sverlet_d4):
    runs = sverlet_d4
    for key in ("xla", "pallas"):
        sim = runs[key]
        assert int(sim.overflow.max()) == 0
        assert int(sim.dropped.sum()) == 0
        assert int(sim.lost.sum()) == 0
        assert int(jnp.sum(sim.alive)) == runs["n"]
        assert int(sim.rebin_count.max()) > 1      # collective rebins fired
        per_dev = sim.alive.tolist()
        assert all(c > 0 for c in per_dev), per_dev
    se, diag = runs["eager"]
    assert int(diag.dropped.sum()) == 0
    assert int(jnp.sum(se.alive)) == runs["n"]


def test_identity_preserved_exactly(sverlet_d4):
    """The dense idx planes still hold the permutation 0..n-1 after
    migration across every interior boundary and multiple rebins."""
    runs = sverlet_d4
    for key in ("xla", "pallas"):
        ids = np.asarray(runs[key].idx_d).reshape(-1)
        ids = np.sort(ids[ids >= 0])
        assert ids.shape[0] == runs["n"]
        assert (ids == np.arange(runs["n"])).all()
    # the eager solver's [D, capacity] idx plane likewise
    se, _ = runs["eager"]
    ids = np.asarray(se.idx)[np.asarray(se.alive)]
    assert (np.sort(ids) == np.arange(runs["n"])).all()


def test_matches_single_chip_flagship_per_particle(sverlet_d4):
    """Sharded verlet vs the single-chip verlet flagship, particle i to
    particle i.  Same physics, different slot/summation order — agreement
    must be at f32-noise level, not just the reference drift bar."""
    runs = sverlet_d4
    v = _original_order(runs, "xla")
    s = runs["single"]
    dx = np.abs(np.asarray(v.x) - np.asarray(s.x)).max()
    dy = np.abs(np.asarray(v.y) - np.asarray(s.y)).max()
    dv = max(np.abs(np.asarray(v.vx) - np.asarray(s.vx)).max(),
             np.abs(np.asarray(v.vy) - np.asarray(s.vy)).max())
    assert dx <= 1e-5 and dy <= 1e-5, (dx, dy)   # measured ~6e-8
    assert dv <= 1e-3, dv
    # and, for the record, five orders inside the reference's bar
    assert max(dx, dy) <= 5.448e-3
    rho_rel = (np.abs(np.asarray(v.rho) - np.asarray(s.rho))
               / np.asarray(s.rho)).max()
    assert rho_rel <= 1e-4, rho_rel


def test_matches_eager_sharded_per_particle(sverlet_d4):
    """Deferred rebinning vs eager re-binning every step: physically
    identical (the frozen 3x3 window is a superset while the skin holds),
    so per-particle agreement is summation-order noise."""
    runs = sverlet_d4
    v = _original_order(runs, "xla")
    se, _ = runs["eager"]
    e = shard.to_fluid_state(se, runs["n"])
    dx = np.abs(np.asarray(v.x) - np.asarray(e.x)).max()
    dy = np.abs(np.asarray(v.y) - np.asarray(e.y)).max()
    assert dx <= 1e-5 and dy <= 1e-5, (dx, dy)
    rho_rel = (np.abs(np.asarray(v.rho) - np.asarray(e.rho))
               / np.asarray(e.rho)).max()
    assert rho_rel <= 1e-3, rho_rel


def test_migration_really_crossed_every_boundary(sverlet_d4):
    """Per-device populations changed from the initial sharding: particles
    moved across slab boundaries (the scene moves right at 4.0 for
    SVERLET_STEPS steps)."""
    runs = sverlet_d4
    sim = runs["xla"]
    init_alive = np.asarray(
        shard.shard_state(runs["state"], runs["spec"]).alive).sum(1)
    end_alive = np.asarray(sim.alive)
    assert (end_alive != init_alive).any(), (init_alive, end_alive)
    # rightward drift: device 0 lost particles, device 3 gained
    assert end_alive[0] < init_alive[0]
    assert int(sim.step) == SVERLET_STEPS


def test_planar_rebin_and_chunked_init_bitwise(sverlet_d4):
    """The sharded large-N posture — plane-at-a-time collective rebin
    (planar=True) + chunked per-device init (init_chunks=K) — is BITWISE
    the sort-init/fused-reslot path on the shared D=4 migration scene:
    same dense planes, same counters, same spill buffers (the sharded twin
    of tests/test_planar.py + the flagship chunked-init gate)."""
    import jax

    runs = sverlet_d4
    mesh = shard.make_mesh(4)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        runs["params"], runs["cfg"], runs["spec"], mesh,
        planar=True, init_chunks=3)
    sim = init_fn(shard.shard_state(runs["state"], runs["spec"]))
    for _ in range(SVERLET_STEPS):
        sim = step_fn(sim)
        jax.block_until_ready(sim.xd)   # 1-core rig: serialize executions
    ref = runs["xla"]
    for f in ("xd", "yd", "vxd", "vyd", "idx_d", "occ", "alive",
              "overflow", "lost", "dropped", "rebin_count",
              "sx", "sy", "svx", "svy", "sidx", "readmitted"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim, f)), np.asarray(getattr(ref, f)),
            err_msg=f"planar/chunked sharded path diverged in {f}")
