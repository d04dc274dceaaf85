"""Deferred-rebinning (Verlet skin) solver: parity + rebin economics."""

import jax
import jax.numpy as jnp
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver, pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.models import reference as golden

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
VGRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0,
                                   cap=8, skin_factor=1.5)


@pytest.fixture(scope="module")
def golden100():
    state = init_grid(24, 24, 0.04)
    return state, jax.jit(lambda s: golden.multi_step(s, PARAMS, CFG, 100))(
        state)


# both stencil backends are held to the same drift bars: "pallas" is the
# flagship shipped combination (Simulation's verlet default + the bench path)
@pytest.fixture(scope="module", params=["xla", "pallas"])
def run100(request, golden100):
    state, g = golden100
    stencils = (grid_solver.XLA_STENCILS if request.param == "xla"
                else pallas_solver.make_stencils(VGRID, interpret=True))
    v, diag, rebins = jax.jit(
        lambda s: verlet_solver.multi_step(
            s, PARAMS, CFG, VGRID, 100, stencils=stencils))(state)
    return g, v, diag, int(rebins)


def test_verlet_matches_golden(run100):
    g, v, diag, rebins = run100
    assert int(diag.overflow) == 0
    dx = float(jnp.maximum(jnp.max(jnp.abs(v.x - g.x)),
                           jnp.max(jnp.abs(v.y - g.y))))
    dv = float(jnp.maximum(jnp.max(jnp.abs(v.vx - g.vx)),
                           jnp.max(jnp.abs(v.vy - g.vy))))
    rel_rho = float(jnp.max(jnp.abs(v.rho - g.rho) / g.rho))
    # the reference's 100-step observed drift bounds (sprint3.md:886-890)
    assert dx <= 0.005448, f"|dx| {dx:.2e}"
    assert dv <= 2.734728, f"|dv| {dv:.2e}"
    assert rel_rho <= 0.01, f"rho rel {rel_rho:.2e}"


def test_rebins_are_deferred(run100):
    # the whole point: far fewer rebins than steps
    _, _, _, rebins = run100
    assert 1 <= rebins < 50, f"expected deferred rebinning, got {rebins}/100"


def test_identical_to_eager_when_skin_never_exceeded():
    # one step: verlet (fresh bins) == eager grid solver, same grid geometry
    state = init_grid(16, 16, 0.04)
    v, diag, _ = verlet_solver.multi_step(state, PARAMS, CFG, VGRID, 1,
                                          stencils=grid_solver.XLA_STENCILS)
    e, _ = grid_solver.multi_step(state, PARAMS, CFG, VGRID, 1,
                                  stencils=grid_solver.XLA_STENCILS)
    assert float(jnp.max(jnp.abs(v.x - e.x))) < 1e-6
    assert float(jnp.max(jnp.abs(v.vx - e.vx))) < 1e-6


# NOTE: the Session-vs-multi_step contract is gated (bitwise, stricter
# than the tolerance check that used to live here) by
# tests/test_session.py::test_session_matches_multi_step on the flagship
# fused path.  The Session glue (run_k / state() / run_frame) is
# stencil-independent, and the XLA-stencil step itself is gated above by
# the run100[xla] fixture tests — repeating the Session pairing with
# explicit XLA stencils re-traced three large XLA-stencil programs for
# 252 s of the suite's 19 min with no added coverage, so it was removed.


def test_init_dense_chunked_bitwise_matches_sort_init():
    """The chunked init (O(N/K) transients, the very-large-N path) must
    reproduce the sort-based init EXACTLY: same slot assignment (stable
    original-order ranks), same overflow count, same spill contents —
    every DenseSim leaf bitwise.  Scene mixes a normal block with an
    overcrowded cluster (9 coincident-cell particles, cap 8) and uses a
    chunk count that doesn't divide N (exercises the padding path)."""
    import dataclasses
    import numpy as np
    a_ = init_grid(24, 24, 0.04)
    b_ = init_grid(3, 3, 0.004)           # all 9 in one cell -> 1 drop
    state = a_.replace(
        x=jnp.concatenate([a_.x, b_.x + 1.7]),
        y=jnp.concatenate([a_.y, b_.y + 0.9]),
        vx=jnp.concatenate([a_.vx, b_.vx]),
        vy=jnp.concatenate([a_.vy, b_.vy]),
        ax=jnp.concatenate([a_.ax, b_.ax]),
        ay=jnp.concatenate([a_.ay, b_.ay]),
        rho=jnp.concatenate([a_.rho, b_.rho]),
        p=jnp.concatenate([a_.p, b_.p]))
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    want = verlet_solver.init_dense(state, grid)
    assert int(want.overflow) >= 1        # the scene really overflows
    for K in (1, 7):                      # 7 : 585 % 7 != 0 -> padded
        got = jax.jit(lambda s: verlet_solver.init_dense_chunked(
            s, grid, n_chunks=K))(state)
        for f in dataclasses.fields(want):
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f.name)),
                np.asarray(getattr(got, f.name)), err_msg=f"{f.name} K={K}")
    # collect_spill=False parity too (recovery-off contract)
    w2 = verlet_solver.init_dense(state, grid, collect_spill=False)
    g2 = verlet_solver.init_dense_chunked(state, grid, n_chunks=4,
                                          collect_spill=False)
    assert int(jnp.sum(g2.sidx >= 0)) == 0
    np.testing.assert_array_equal(np.asarray(w2.xd), np.asarray(g2.xd))


def test_init_dense_gen_bitwise_matches_sort_init():
    """The generator init (no [N] planes on device, the top-of-HBM path)
    must reproduce the sort-based init of the same lattice EXACTLY —
    every DenseSim leaf bitwise — including with a chunk count that
    doesn't divide N (the in-scan tail masking)."""
    import dataclasses
    import numpy as np
    from bevy_gpu_fluid_tpu import lattice_gen
    state = init_grid(24, 24, 0.04)
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    want = verlet_solver.init_dense(state, grid)
    for K in (1, 7):                      # 7: 576 % 7 != 0 -> masked tail
        got = jax.jit(lambda: verlet_solver.init_dense_gen(
            lattice_gen(24, 0.04), state.n, grid, n_chunks=K))()
        for f in dataclasses.fields(want):
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f.name)),
                np.asarray(getattr(got, f.name)), err_msg=f"{f.name} K={K}")


def test_session_from_generator_matches_state_session():
    """Session.from_generator must produce the same trajectory as a
    Session constructed from the materialized FluidState of the same
    scene."""
    import numpy as np
    from bevy_gpu_fluid_tpu import lattice_gen
    state = init_grid(24, 24, 0.04)
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0)
    a = verlet_solver.Session(state, PARAMS, CFG, grid)
    b = verlet_solver.Session.from_generator(
        lattice_gen(24, 0.04), state.n, PARAMS, CFG, grid, init_chunks=3)
    a.run(40)
    b.run(40)
    sa, sb = a.state(), b.state()
    np.testing.assert_array_equal(np.asarray(sa.x), np.asarray(sb.x))
    np.testing.assert_array_equal(np.asarray(sa.vx), np.asarray(sb.vx))
    assert int(b.sim.rebin_count) == int(a.sim.rebin_count)
    assert b.overflow == 0


def test_session_donate_runs_and_matches():
    """donate=True (the very-large-N memory knob) must not change results:
    a donated Session's trajectory equals the default Session's."""
    import numpy as np
    state = init_grid(24, 24, 0.04)
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0)
    a = verlet_solver.Session(state, PARAMS, CFG, grid)
    b = verlet_solver.Session(state, PARAMS, CFG, grid, donate=True,
                              init_chunks=3)
    a.run(40)
    b.run(40)
    sa, sb = a.state(), b.state()
    np.testing.assert_array_equal(np.asarray(sa.x), np.asarray(sb.x))
    np.testing.assert_array_equal(np.asarray(sa.vx), np.asarray(sb.vx))
    assert int(b.sim.rebin_count) == int(a.sim.rebin_count)


@pytest.mark.parametrize("total", [0, 1, 7, 1000, 1024, 1025, 4096, 5555])
def test_first_k_flat_ragged_sizes(total):
    """_first_k_flat must agree with jnp.nonzero(size=k, fill=total) at ANY
    size — including sizes that are not a multiple of its 1024 block (it
    pads with False rather than shrinking the block, which would silently
    reintroduce the full-[total] temps it exists to avoid; ADVICE r4)."""
    import numpy as np
    rng = np.random.default_rng(total)
    k = 16
    mask = jnp.asarray(rng.random(total) < 0.01) if total else \
        jnp.zeros((0,), bool)
    got = np.asarray(verlet_solver._first_k_flat(mask, k))
    want = np.asarray(jnp.nonzero(mask, size=k, fill_value=total)[0]) \
        if total else np.zeros(k, np.int32)
    np.testing.assert_array_equal(got, want)
