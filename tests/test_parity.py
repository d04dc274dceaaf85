"""Parity gates: accelerated grid solver vs the golden model.

Promotes the reference's manual parity examples into CI, at equal-or-better
tolerances (reference: examples/gpu_parity10.rs:18-19 asserts rho max-rel
<= 1% and p max-abs <= 30 after 10 steps; observed there: rho ~0.3%, and
integration drift |dx| <= 0.000518 @ 10 steps, |dx| <= 0.005448 / |dv| <=
2.734728 @ 100 steps, reference: docs/sprint3/sprint3.md:879-890).
"""

import jax
import jax.numpy as jnp
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, demo_block_5k, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver, pallas_solver
from bevy_gpu_fluid_tpu.models import reference as golden

CFG = IntegrateConfig.create()  # dt=0.0005, x in [-5, 3], bounce=-3
GRID = grid_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0, cap=8)

SOLVERS = {
    "xla": lambda s, p, n: grid_solver.multi_step(s, p, CFG, GRID, n),
    "pallas": lambda s, p, n: pallas_solver.multi_step(s, p, CFG, GRID, n),
}


def _run_both(state, params, n_steps, solver="xla"):
    g = jax.jit(lambda s: golden.multi_step(s, params, CFG, n_steps))(state)
    a, diag = jax.jit(
        lambda s: SOLVERS[solver](s, params, n_steps))(state)
    assert int(diag.overflow) == 0, "cell cap overflow during parity run"
    return g, a


def _sym_rel(a, b, eps=1e-6):
    # symmetric relative norm, as the reference's integration parity uses
    # (reference: examples/gpu_integration_parity.rs:18-23)
    denom = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)), eps)
    return jnp.abs(a - b) / denom


@pytest.fixture(scope="module", params=["xla", "pallas"])
def run10(request):
    state, params = demo_block_5k()
    return _run_both(state, params, 10, solver=request.param)


class TestParity10:
    """Density/pressure parity after 10 steps on the 5,041-particle scene
    (reference: examples/gpu_parity10.rs), for both accelerated solvers."""

    def test_density_max_rel(self, run10):
        g, a = run10
        rel = float(jnp.max(jnp.abs(a.rho - g.rho) / g.rho))
        # gate (1%) and the reference's observed bar (0.3%)
        assert rel <= 0.003, f"density max rel err {rel:.2e} > 0.3%"

    def test_pressure_max_abs(self, run10):
        g, a = run10
        err = float(jnp.max(jnp.abs(a.p - g.p)))
        assert err <= 30.0, f"pressure max abs err {err:.3f} > 30"

    def test_integration_drift_10(self, run10):
        g, a = run10
        dx = float(jnp.maximum(jnp.max(jnp.abs(a.x - g.x)),
                               jnp.max(jnp.abs(a.y - g.y))))
        dv = float(jnp.maximum(jnp.max(jnp.abs(a.vx - g.vx)),
                               jnp.max(jnp.abs(a.vy - g.vy))))
        assert dx <= 0.000518, f"|dx| {dx:.2e} worse than reference's 5.18e-4"
        assert dv <= 0.245602, f"|dv| {dv:.2e} worse than reference's 0.2456"


def test_integration_drift_100():
    # 100-step drift gate at the reference's observed bounds, on the
    # 1,024-particle bench scene to keep the O(N^2) golden model CI-fast.
    state = init_grid(32, 32, 0.04)
    params = FluidParams.demo()
    g, a = _run_both(state, params, 100)
    dx = float(jnp.maximum(jnp.max(jnp.abs(a.x - g.x)),
                           jnp.max(jnp.abs(a.y - g.y))))
    dv = float(jnp.maximum(jnp.max(jnp.abs(a.vx - g.vx)),
                           jnp.max(jnp.abs(a.vy - g.vy))))
    assert bool(jnp.all(jnp.isfinite(a.x)) and jnp.all(jnp.isfinite(a.y)))
    assert dx <= 0.005448, f"|dx| {dx:.2e} worse than reference's 5.448e-3"
    assert dv <= 2.734728, f"|dv| {dv:.2e} worse than reference's 2.7347"


@pytest.mark.parametrize("solver_step", [
    lambda s, p: grid_solver.step(s, p, CFG, GRID),
    lambda s, p: pallas_solver.step(s, p, CFG, GRID),
], ids=["xla", "pallas"])
def test_single_step_fields_match(solver_step):
    # one step: rho, p, acc agree elementwise to tight f32 tolerance
    state, params = demo_block_5k()
    g = golden.step(state, params, CFG)
    a = solver_step(state, params)
    assert float(jnp.max(_sym_rel(a.rho, g.rho))) < 1e-5
    assert float(jnp.max(jnp.abs(a.p - g.p))) < 0.05
    assert float(jnp.max(jnp.abs(a.ax - g.ax))) < 0.05
    assert float(jnp.max(jnp.abs(a.ay - g.ay))) < 0.05


def test_density_ghost_rows_pinned_to_zero():
    """The density kernel's grid writes interior blocks only, yet the
    forces kernel's halo window reads rho one row into the outer ghost
    blocks.  density_pallas must pin those blocks to zero — in interpret
    mode unwritten output is NaN, so this test fails loudly if the fill is
    ever dropped (a NaN/Inf there would poison adjacent real rows through
    p_j despite the FAR position gate: NaN * 0 = NaN)."""
    from bevy_gpu_fluid_tpu.ops.binning import FAR, bin_particles, to_dense

    state, params = demo_block_5k()
    b = bin_particles(state.x, state.y, GRID, with_csr=False)
    xd = to_dense(b, state.x, fill=FAR)
    yd = to_dense(b, state.y, fill=FAR)
    rho_d = pallas_solver.density_pallas(xd, yd, params, GRID,
                                         interpret=True)
    tb = GRID.row_block
    assert jnp.all(rho_d[:tb] == 0.0)
    assert jnp.all(rho_d[-tb:] == 0.0)
    assert bool(jnp.isfinite(rho_d).all())
    # and the full step built on it stays finite
    ax_d, ay_d = pallas_solver.forces_pallas(
        xd, yd, to_dense(b, state.vx), to_dense(b, state.vy), rho_d,
        params, GRID, interpret=True)
    real = (slice(GRID.row0, GRID.row0 + GRID.ny), slice(None),
            slice(1, 1 + GRID.nx))
    assert bool(jnp.isfinite(ax_d[real]).all())
    assert bool(jnp.isfinite(ay_d[real]).all())


def test_random_configurations_parity():
    """Randomized single-step parity sweep: random clouds with
    near-coincident pairs (r ~ 50*EPS) and boundary-exact positions —
    pair-gating edge cases the lattice demo scenes never produce.

    Acceleration compares at 0.1 abs + 1e-3 rel: the Pallas kernel's
    branch-free inv_r = rsqrt(r^2 + EPS^2) softens the pressure force by
    EPS^2/(2 r^2) relative (2e-4 at r = 50*EPS, vanishing as r grows) —
    physically irrelevant on pairs the EOS is about to blast apart, and
    documented in models/pallas_solver.py."""
    from bevy_gpu_fluid_tpu.core.state import from_positions

    key = jax.random.PRNGKey(7)
    params = FluidParams.demo()
    for trial in range(3):
        key, k1, k2, k3 = jax.random.split(key, 4)
        pos = jax.random.uniform(k1, (96, 2), minval=-0.2, maxval=0.8)
        # a near-coincident pair and boundary-exact points
        pos = pos.at[1].set(pos[0] + jnp.array([5e-5, 0.0]))
        pos = pos.at[2].set(jnp.array([CFG.x_min, 0.0]))
        pos = pos.at[3].set(jnp.array([CFG.x_max, 0.0]))
        vel = jax.random.uniform(k2, (96, 2), minval=-2.0, maxval=2.0)
        state = from_positions(pos).replace(vx=vel[:, 0], vy=vel[:, 1])

        g = jax.jit(lambda s: golden.step(s, params, CFG))(state)
        a = jax.jit(lambda s: pallas_solver.step(s, params, CFG, GRID))(state)
        assert bool(jnp.isfinite(a.x).all() and jnp.isfinite(a.ax).all())
        assert float(jnp.max(_sym_rel(a.rho, g.rho))) < 1e-5, f"trial {trial}"
        bar_x = 0.1 + 1e-3 * jnp.abs(g.ax)
        bar_y = 0.1 + 1e-3 * jnp.abs(g.ay)
        assert bool(jnp.all(jnp.abs(a.ax - g.ax) < bar_x)), f"trial {trial}"
        assert bool(jnp.all(jnp.abs(a.ay - g.ay) < bar_y)), f"trial {trial}"
        assert float(jnp.max(jnp.abs(a.x - g.x))) < 1e-5
