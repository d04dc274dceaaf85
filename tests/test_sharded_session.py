"""ShardedSession facade: the single-chip Session contract over a mesh
(run in one dispatch, frames from resident state, original-order
extraction, bitwise resident checkpoint resume, cross-slab impulse)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.parallel import shard
from bevy_gpu_fluid_tpu.parallel.sharded_session import ShardedSession

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)


@pytest.fixture(scope="module")
def sess2():
    """D=2 session on a wide block spanning both slabs, stepped enough to
    fire at least one collective rebin."""
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=2, capacity=1024)
    # block x in [0.3, 1.26]: straddles the D=2 slab boundary at 0.75
    state = init_grid(24, 6, 0.04)
    state = state.replace(x=state.x + 0.3, vx=jnp.full((state.n,), 3.0))
    s = ShardedSession(state, PARAMS, CFG, spec)
    s.run(12)
    return s, state


def test_run_conserves_and_rebins(sess2):
    s, state = sess2
    assert sum(s.alive) == state.n
    assert s.overflow == 0 and s.dropped == 0 and s.lost == 0
    assert s.rebin_count >= 1
    assert s.step == 12


def test_state_is_original_order(sess2):
    s, state = sess2
    out = s.state()
    assert bool(jnp.isfinite(out.x).all())
    # identity: every original index present exactly once across slabs
    ids = np.sort(np.asarray(s.sim.idx_d).reshape(-1))
    assert (ids[ids >= 0] == np.arange(state.n)).all()


def test_save_restore_continues_bitwise(sess2, tmp_path):
    s, _ = sess2
    path = os.fspath(tmp_path / "shsess.ckpt")
    s.save(path)
    r = ShardedSession.restore(path)
    assert r.n == s.n and r.step == s.step
    # both advance the same program from the same snapshot: bitwise
    r.run(6)
    want = s._run_k(s.sim, 6)
    jax.block_until_ready(want)
    for a, b in zip(jax.tree_util.tree_leaves(r.sim),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frame_spans_all_slabs(sess2):
    s, _ = sess2
    img = s.frame()
    assert img.dtype == jnp.uint8 and img.ndim == 3 and img.shape[2] == 3
    W = s.spec.n_devices * s.spec.nx_local * 2     # px_per_cell=2
    assert img.shape[1] == W
    # particles span both slabs -> both halves of the frame have wet pixels
    left = np.asarray(img[:, :W // 2]).sum()
    right = np.asarray(img[:, W // 2:]).sum()
    assert left > 0 and right > 0

    step0 = s.step
    img2 = s.run_frame(substeps=2)
    assert img2.shape == img.shape
    assert s.step == step0 + 2


def test_run_frames_batched(sess2):
    """Batched multi-frame dispatch: stacked [f, H, W, 3] strips assembled
    across slabs, stepping f*substeps total (the bitwise batched-vs-
    sequential property is pinned single-chip in test_session.py; the
    mechanism — scan of step+raster — is identical here)."""
    s, _ = sess2
    step0 = s.step
    imgs = s.run_frames(2, substeps=2)
    assert imgs.dtype == jnp.uint8 and imgs.ndim == 4
    assert imgs.shape[0] == 2 and imgs.shape[3] == 3
    W = s.spec.n_devices * s.spec.nx_local * 2     # px_per_cell=2
    assert imgs.shape[2] == W
    assert s.step == step0 + 4
    assert np.asarray(imgs[1]).sum() > 0


def test_runtime_validator_passes(sess2):
    """The reference's in-engine rho/p/acc gate (buffers.rs:564-567) holds
    for the multi-chip run at its enforced tolerances."""
    s, _ = sess2
    report = s.validate()          # raises on tolerance failure
    assert report.rho_max_rel <= 0.01
    assert report.acc_max_abs <= 0.5 or report.acc_max_rel <= 0.01


def test_kick_hits_only_within_radius(sess2):
    s, _ = sess2
    before = s.state()
    # kick near the slab boundary so both devices' particles are in range
    cx = float(s.spec.global_x0 + s.spec.slab_width)
    cy = float(jnp.median(before.y[jnp.isfinite(before.y)]))
    s.kick(cx, cy, 0.0, 1.0)
    after = s.state()
    d2 = (before.x - cx) ** 2 + (before.y - cy) ** 2
    changed = np.asarray(jnp.abs(after.vy - before.vy) > 1e-9)
    inside = np.asarray(d2 < 0.04)
    assert changed[inside].all(), "in-range particles must be kicked"
    assert not changed[~inside].any(), "out-of-range particles must not"
    assert inside.sum() > 0


@pytest.fixture(scope="module")
def baseline12(sess2):
    """Fresh 12-step default-posture session: the shared ``sess2`` session
    is advanced/kicked by earlier tests, so posture-comparison tests need
    an unmutated baseline (built once, read-only)."""
    s, state = sess2
    a = ShardedSession(state, PARAMS, CFG, s.spec)
    a.run(12)
    return a


def test_large_n_posture_knobs_bitwise(sess2, baseline12):
    """ShardedSession's HBM-posture knobs (planar_rebin, init_chunks,
    donate, run(chunk=)) reproduce the default session's trajectory
    BITWISE on the D=2 rebin scene — they are memory postures, not
    physics changes (the sharded twin of Session's large-N contract)."""
    s, state = sess2
    spec = s.spec
    a = baseline12
    b = ShardedSession(state, PARAMS, CFG, spec, planar_rebin=True,
                       init_chunks=3, donate=True)
    b.run(12, chunk=5)                  # 5 + 5 + 2 dispatches
    fa, fb = a.state(), b.state()
    for f in ("x", "y", "vx", "vy", "rho"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fa, f)), np.asarray(getattr(fb, f)),
            err_msg=f"posture knobs diverged in {f}")
    assert b.overflow == a.overflow == 0
    assert b.rebin_count == a.rebin_count


def test_sharded_refless_trigger(sess2, baseline12):
    """The sharded refless trigger (ShardedSession(refless_trigger=True)):
    per-device ref planes are [D,1,1,1] placeholders, the accumulated
    bound rebins conservatively (>= the ref-based schedule), physics
    agrees to f32 noise on the D=2 migration scene, and the posture is
    fingerprint-recorded."""
    s, state = sess2
    spec = s.spec
    a = baseline12
    b = ShardedSession(state, PARAMS, CFG, spec, refless_trigger=True)
    assert b.sim.ref_xd.shape == (2, 1, 1, 1)
    b.run(12)
    assert b.rebin_count >= a.rebin_count
    assert b.overflow == a.overflow == 0
    fa, fb = a.state(), b.state()
    np.testing.assert_allclose(np.asarray(fa.x), np.asarray(fb.x),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fa.vx), np.asarray(fb.vx),
                               atol=5e-3)
    assert b._fingerprint["refless"] is True
    # identity survives the earlier rebin schedule
    ids = np.asarray(b.sim.idx_d).reshape(-1)
    ids = np.sort(ids[ids >= 0])
    np.testing.assert_array_equal(ids, np.arange(state.n))


def test_sharded_segmented_donor_chain_matches_standard(sess2):
    """The sharded HBM-ceiling driver (ShardedSession(segmented=True):
    cond-free while_loop segments + the ROTATED donated rebin dispatch —
    apply outputs land in the previous plane's dead buffers, rho seeding
    the chain) walks the SAME trajectory as the standard cond-in-scan
    step on the D=2 migration scene — bitwise, rebin counters included,
    across chunked run() boundaries."""
    s, state = sess2
    a = ShardedSession(state, PARAMS, CFG, s.spec, refless_trigger=True)
    a.run(24)
    b = ShardedSession(state, PARAMS, CFG, s.spec, refless_trigger=True,
                       planar_rebin=True, donate=True, segmented=True)
    b._run_segmented(0, None)  # force-build to check the posture
    assert b._segmented_fns[2], "refless+donate must select the rotation"
    b.run(14)
    b.run(10, chunk=6)
    np.testing.assert_array_equal(np.asarray(a.sim.rebin_count),
                                  np.asarray(b.sim.rebin_count))
    assert int(np.max(np.asarray(b.sim.rebin_count))) > 1
    assert int(a.sim.step) == int(b.sim.step) == 24
    for f in ("xd", "yd", "vxd", "vyd", "idx_d", "age"):
        np.testing.assert_array_equal(np.asarray(getattr(a.sim, f)),
                                      np.asarray(getattr(b.sim, f)),
                                      err_msg=f)
    np.testing.assert_array_equal(np.asarray(a.sim.rho_d),
                                  np.asarray(b.sim.rho_d))


def test_from_generator_bitwise(sess2, baseline12):
    """ShardedSession.from_generator (per-device generator init — no [N]
    FluidState or [D, capacity] ShardedState on device, the 128M/device
    init-OOM fix) is BITWISE the shard_state + chunked-init construction
    for the same scene: each device scans global-index chunks and keeps
    its slab's particles; the chunk-init body's stable-rank machinery is
    chunk-boundary-independent and slab compaction preserves original
    particle order."""
    s, state = sess2
    a = baseline12

    def gen(gi):
        # the sess2 scene: init_grid(24, 6, 0.04) shifted x+0.3, vx=3.0
        x = (gi % 24).astype(jnp.float32) * 0.04 + 0.3
        y = (gi // 24).astype(jnp.float32) * 0.04
        return x, y, jnp.full_like(x, 3.0), jnp.zeros_like(x)

    b = ShardedSession.from_generator(gen, state.n, PARAMS, CFG, s.spec,
                                      init_chunks=3, donate=False)
    b.run(12)
    assert b.rebin_count == a.rebin_count
    assert b.overflow == a.overflow == 0
    fa, fb = a.state(), b.state()
    for f in ("x", "y", "vx", "vy", "rho"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fa, f)), np.asarray(getattr(fb, f)),
            err_msg=f"generator init diverged in {f}")


def test_d1_unwrapped_rotated_rebin_bitwise():
    """At D=1 the rotated segmented rebin runs UNWRAPPED (no shard_map:
    donation pairing does not alias through the shard_map boundary, the
    160M/device runtime OOM) — bitwise the standard D=1 trajectory."""
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=1, capacity=2048)

    def gen(gi):
        x = (gi % 30).astype(jnp.float32) * 0.04 + 0.2
        y = (gi // 30).astype(jnp.float32) * 0.04
        return x, y, jnp.full_like(x, 2.0), jnp.zeros_like(x)

    n = 30 * 20
    a = ShardedSession.from_generator(gen, n, PARAMS, CFG, spec,
                                      refless_trigger=True, donate=False)
    a.run(24)
    b = ShardedSession.from_generator(gen, n, PARAMS, CFG, spec,
                                      refless_trigger=True,
                                      planar_rebin=True, donate=True,
                                      segmented=True)
    b._run_segmented(0, None)
    assert b._segmented_fns[2]
    b.run(14)
    b.run(10, chunk=6)
    np.testing.assert_array_equal(np.asarray(a.sim.rebin_count),
                                  np.asarray(b.sim.rebin_count))
    assert int(np.max(np.asarray(b.sim.rebin_count))) > 1
    for f in ("xd", "yd", "vxd", "vyd", "idx_d"):
        np.testing.assert_array_equal(np.asarray(getattr(a.sim, f)),
                                      np.asarray(getattr(b.sim, f)),
                                      err_msg=f)
    assert b.sim.idx_d.dtype == jnp.int32
