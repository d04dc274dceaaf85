"""Persistent dense Session (the production streaming/bench shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import verlet_solver

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
GRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)


def test_session_matches_multi_step():
    """Session.run + state() computes exactly what multi_step does (same
    init, same scan, same extraction) — the bench/streaming path is the
    same physics as the tested batch path, bitwise."""
    state = init_grid(20, 20, 0.04)
    sess = verlet_solver.Session(state, PARAMS, CFG, GRID)
    sess.run(30)
    sess.run(20)   # split across calls: state stays resident
    got = sess.state()

    want, diag, rebins = jax.jit(
        lambda s: verlet_solver.multi_step(s, PARAMS, CFG, GRID, 50))(state)
    assert sess.overflow == int(diag.overflow) == 0
    assert int(sess.sim.rebin_count) == int(rebins)
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(want.x))
    np.testing.assert_array_equal(np.asarray(got.vx), np.asarray(want.vx))
    np.testing.assert_array_equal(np.asarray(got.rho), np.asarray(want.rho))
    assert int(got.step) == 50


def test_session_run_chunked_matches_single_dispatch():
    """run(n, chunk=K) — the long-dispatch splitter for transports with an
    RPC deadline (measured ~60 s on the tunnel rig) — is bitwise the same
    trajectory as one n-step dispatch."""
    state = init_grid(20, 20, 0.04)
    a = verlet_solver.Session(state, PARAMS, CFG, GRID)
    a.run(48)
    b = verlet_solver.Session(state, PARAMS, CFG, GRID)
    b.run(48, chunk=20)   # 20+20+8
    ga, gb = a.state(), b.state()
    assert int(a.sim.rebin_count) == int(b.sim.rebin_count)
    np.testing.assert_array_equal(np.asarray(ga.x), np.asarray(gb.x))
    np.testing.assert_array_equal(np.asarray(ga.vx), np.asarray(gb.vx))


def test_session_run_frame():
    state = init_grid(16, 16, 0.04)
    sess = verlet_solver.Session(state, PARAMS, CFG, GRID)
    img = np.asarray(sess.run_frame(substeps=8, px_per_cell=1))
    assert img.dtype == np.uint8
    assert img.shape == (GRID.ny, GRID.nx, 3)
    assert int(sess.sim.step) == 8
    # the block renders: some wet pixels, not all
    wet = img.sum(-1) > 10
    assert wet.any() and not wet.all()
    assert sess.overflow == 0


def test_session_segmented_run_matches_standard():
    """The segmented HBM-ceiling driver (Session(segmented=True): pure-step
    while_loop segments + rebins as their own donated dispatches) walks the
    SAME trajectory as the standard cond-in-scan driver — bitwise, rebin
    counters included — across run() call boundaries and chunking."""
    state = init_grid(20, 20, 0.04)
    a = verlet_solver.Session(state, PARAMS, CFG, GRID)
    a.run(30)
    a.run(20)
    b = verlet_solver.Session(state, PARAMS, CFG, GRID, segmented=True)
    assert b.segmented
    b.run(30)
    b.run(20, chunk=12)   # segment bound < rebin cadence: exercises the
    # trigger-clear continue path
    assert int(a.sim.rebin_count) == int(b.sim.rebin_count) > 0
    assert int(a.sim.step) == int(b.sim.step) == 50
    assert a.overflow == b.overflow == 0
    for f in ("xd", "yd", "vxd", "vyd", "rho_d", "idx_d", "age"):
        np.testing.assert_array_equal(np.asarray(getattr(a.sim, f)),
                                      np.asarray(getattr(b.sim, f)),
                                      err_msg=f)


def test_session_segmented_unfused_posture_matches_standard():
    """The full HBM-ceiling posture (two-kernel stencils + segmented
    driver — what a >=152M Session auto-selects) walks the same trajectory
    as the standard driver with the same stencils, bitwise."""
    from bevy_gpu_fluid_tpu.models import pallas_solver
    state = init_grid(16, 16, 0.04)
    stencils = pallas_solver.make_stencils(GRID)
    a = verlet_solver.Session(state, PARAMS, CFG, GRID, stencils=stencils)
    a.run(30)
    b = verlet_solver.Session(state, PARAMS, CFG, GRID, stencils=stencils,
                              segmented=True)
    b.run(30, chunk=9)
    assert int(a.sim.rebin_count) == int(b.sim.rebin_count)
    assert int(a.sim.step) == int(b.sim.step) == 30
    for f in ("xd", "yd", "vxd", "vyd", "idx_d"):
        np.testing.assert_array_equal(np.asarray(getattr(a.sim, f)),
                                      np.asarray(getattr(b.sim, f)),
                                      err_msg=f)


def test_session_run_frames_batched_matches_sequential():
    """run_frames(f, k) — the throughput frame path (one dispatch, stacked
    [f, H, W, 3] output) — runs the same trajectory BITWISE as f
    sequential run_frame(k) calls.  Frame bytes are compared at ±1: the
    raster's f32->uint8 colormap can land exactly on a rounding boundary,
    and two separately-compiled XLA programs may round such a pixel
    differently (observed on XLA:CPU: 1-2 pixels per 8k, |Δ|=1, with the
    dense state planes still bitwise equal)."""
    state = init_grid(16, 16, 0.04)
    a = verlet_solver.Session(state, PARAMS, CFG, GRID)
    imgs = np.asarray(a.run_frames(3, substeps=8, px_per_cell=1))
    assert imgs.dtype == np.uint8
    assert imgs.shape == (3, GRID.ny, GRID.nx, 3)
    b = verlet_solver.Session(state, PARAMS, CFG, GRID)
    for i in range(3):
        seq = np.asarray(b.run_frame(substeps=8, px_per_cell=1))
        d = np.abs(imgs[i].astype(np.int16) - seq.astype(np.int16))
        assert int(d.max()) <= 1 and float((d > 0).mean()) < 1e-3
    assert int(a.sim.step) == int(b.sim.step) == 24
    np.testing.assert_array_equal(np.asarray(a.sim.xd), np.asarray(b.sim.xd))
    np.testing.assert_array_equal(np.asarray(a.sim.vxd),
                                  np.asarray(b.sim.vxd))


def test_session_kick_matches_particle_impulse():
    """Session.kick applies the reference's drag impulse directly on the
    resident dense state — identical to extracting, applying the
    per-particle impulse, and re-binning."""
    from bevy_gpu_fluid_tpu.interact.impulse import apply_impulse

    state = init_grid(16, 16, 0.04)
    sess = verlet_solver.Session(state, PARAMS, CFG, GRID)
    sess.run(10)
    ref = apply_impulse(sess.state(), 0.3, 0.2, 0.8, 0.6)
    sess.kick(0.3, 0.2, 0.8, 0.6)
    got = sess.state()
    np.testing.assert_array_equal(np.asarray(got.vx), np.asarray(ref.vx))
    np.testing.assert_array_equal(np.asarray(got.vy), np.asarray(ref.vy))
    # and the sim keeps running finitely after the kick
    sess.run(20)
    assert sess.overflow == 0
    assert bool(jnp.isfinite(sess.state().x).all())


def test_refless_trigger_posture():
    """The HBM-ceiling refless trigger (Session(refless_trigger=True)):
    ref planes are (1,1,1) placeholders (the 2-plane-footprint shed that
    un-faults 160M), rebins fire conservatively (>= the ref-based
    schedule), physics agrees to f32 noise, and cross-posture restore is
    fingerprint-rejected (the schedules differ, so continuation would
    silently diverge)."""
    import numpy as np

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.models import verlet_solver

    state = bgf.init_grid(24, 24, 0.04)
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=2.5)
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)

    a = verlet_solver.Session(state, params, cfg, grid)
    b = verlet_solver.Session(state, params, cfg, grid,
                              refless_trigger=True)
    assert b.sim.ref_xd.shape == (1, 1, 1)
    a.run(120)
    b.run(120)
    assert int(b.sim.rebin_count) >= int(a.sim.rebin_count)
    sa, sb = a.state(), b.state()
    assert a.overflow == b.overflow == 0
    np.testing.assert_allclose(np.asarray(sa.x), np.asarray(sb.x),
                               atol=5e-5)
    assert bool(jnp.isfinite(sb.x).all())


def test_segmented_donor_chain_rebin_matches_standard():
    """The donor-chain rebin (the full >176M posture: segmented + donated
    + planar + refless => the rotated ``rebin_one`` whose applies write
    into the previous plane's dead buffer, rho seeding the chain) walks
    the SAME trajectory as the refless standard driver — bitwise, across
    chunked run() boundaries.  The chain is a buffer-placement change
    only; values, schedules, and diagnostics must be identical."""
    state = init_grid(20, 20, 0.04)
    a = verlet_solver.Session(state, PARAMS, CFG, GRID,
                              refless_trigger=True)
    a.run(30)
    a.run(20)
    b = verlet_solver.Session(state, PARAMS, CFG, GRID,
                              refless_trigger=True, planar_rebin=True,
                              donate=True, segmented=True)
    _, _, rotated = b._segmented_build()
    assert rotated, "posture must select the donor-chain rebin"
    b.run(30)
    b.run(20, chunk=12)
    assert int(a.sim.rebin_count) == int(b.sim.rebin_count) > 0
    assert int(a.sim.step) == int(b.sim.step) == 50
    assert a.overflow == b.overflow == 0
    for f in ("xd", "yd", "vxd", "vyd", "idx_d", "age"):
        np.testing.assert_array_equal(np.asarray(getattr(a.sim, f)),
                                      np.asarray(getattr(b.sim, f)),
                                      err_msg=f)
    # rho after a run always comes from the last pure step: equal too
    np.testing.assert_array_equal(np.asarray(a.sim.rho_d),
                                  np.asarray(b.sim.rho_d))


def test_refless_restore_fingerprint(tmp_path):
    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.models import verlet_solver

    state = bgf.init_grid(12, 12, 0.04)
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)
    b = verlet_solver.Session(state, bgf.FluidParams.demo(),
                              bgf.IntegrateConfig.create(x_min=-1.0,
                                                         x_max=2.5),
                              grid, refless_trigger=True)
    b.run(5)
    p = str(tmp_path / "refless.npz")
    b.save(p)
    c = verlet_solver.Session.restore(p, refless_trigger=True)
    assert c.refless_trigger and c.sim.ref_xd.shape == (1, 1, 1)
    with pytest.raises(ValueError):
        verlet_solver.Session.restore(p, refless_trigger=False)
