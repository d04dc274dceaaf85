"""Cell-capacity overflow: the degradation + RECOVERY story (overflow > 0).

Every other test asserts overflow == 0; this one deliberately overfills a
cell (9 particles at 0.004 spacing all hash to one cell, cap=8) and pins
down the DOCUMENTED per-solver behavior:

* eager grid/pallas solvers: overflowed particles fall back to self-density
  and gravity-only acceleration — they keep integrating, nothing NaNs
  (models/grid_solver.py overflow fallback);
* verlet solver: overflowed particles are SUSPENDED in a spill buffer
  (frozen state, no forces) and RE-ADMITTED at a later rebin once their
  cell has free capacity — the transient-compression case.  They surface
  in extracted states at their frozen positions (never FAR unless the
  spill itself overflows), drops are counted in ``overflow`` and
  recoveries in ``readmitted`` (models/verlet_solver.py module docstring).

In both cases: every lost interaction is COUNTED, dynamics stay finite, and
the diagnostics let callers size ``cap``/``spill_cap``.
"""

import jax
import jax.numpy as jnp

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops.binning import FAR

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5, bounce=-0.5)


def crowded_state():
    # 3x3 block at 0.004 spacing: all 9 particles land in one cell for both
    # the h cells (0.045, eager) and the skinned 1.5h cells (0.0675, verlet)
    return init_grid(3, 3, 0.004)


def test_eager_overflow_keeps_integrating():
    grid = grid_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)
    state = crowded_state()
    out, diag = grid_solver.multi_step(state, PARAMS, CFG, grid, 10)
    assert int(diag.overflow) >= 1
    # ALL particles (including the overflowed one) keep finite dynamics
    assert bool(jnp.isfinite(out.x).all() & jnp.isfinite(out.y).all())
    assert bool(jnp.isfinite(out.vx).all() & jnp.isfinite(out.vy).all())
    # everyone kept integrating: the overcrowded cluster blasted apart
    # (physical: enormous EOS pressure) and no particle is frozen in place
    moved = (out.x != state.x) | (out.y != state.y)
    assert bool(moved.all())
    # self-density fallback: no zero/garbage densities anywhere
    assert float(jnp.min(out.rho)) > 900.0


def test_verlet_overflow_suspends_counts_and_recovers():
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()
    sess = verlet_solver.Session(state, PARAMS, CFG, grid)
    # the init sort drops 1 of the 9 coincident-cell particles -> spill
    assert sess.overflow == 1
    assert sess.suspended == 1
    # the suspended particle surfaces at its FROZEN position, not FAR
    s0 = sess.state()
    assert bool(jnp.isfinite(s0.x).all() & (s0.x < FAR * 0.5).all())
    # the 8 slotted particles blast apart (enormous EOS pressure — this
    # scene is deliberately violent; fast particles may cycle through
    # window-loss -> spill -> re-admission), rebins fire, the crowded cell
    # frees up, and the spilled particle re-admits
    sess.run(60)
    assert sess.readmitted >= 1
    # identity partition: after drop/suspend/re-admit churn, the multiset of
    # ids across {dense idx planes} U {spill buffer} is EXACTLY {0..n-1} —
    # a false "found" in the recovery collect's window-local membership test
    # loses an id, a false "gone" duplicates one (see _spill_recover)
    ids = jnp.concatenate([sess.sim.idx_d.reshape(-1), sess.sim.sidx])
    ids = jnp.sort(ids)[-state.n:]
    assert bool((ids == jnp.arange(state.n)).all())
    out = sess.state()
    # conservation: every particle is resident or suspended-at-position —
    # nothing is permanently lost to FAR
    assert bool((out.x < FAR * 0.5).all())
    assert bool(jnp.isfinite(out.x).all() & jnp.isfinite(out.vx).all())
    # the formerly-suspended particle (idx 8 — rank 8 of the 9 coincident
    # particles in the stable init sort) was re-admitted at some point and
    # moved off its frozen drop position (gravity at minimum)
    moved = jnp.abs(out.x[8] - s0.x[8]) + jnp.abs(out.y[8] - s0.y[8])
    assert float(moved) > 0.0


def test_verlet_multistep_overflow_diag_counts_drops():
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()
    out, diag, _ = verlet_solver.multi_step(state, PARAMS, CFG, grid, 10)
    # cumulative drop count still surfaces (recovery does not hide it)
    assert int(diag.overflow) >= 1
    # no particle is FAR: it is either resident or suspended-at-position
    assert bool((out.x < FAR * 0.5).all())
    assert bool(jnp.isfinite(out.x).all() & jnp.isfinite(out.vx).all())


def test_verlet_recovery_conserves_under_jit_scan():
    # recovery path inside lax.scan/cond compiles and conserves particles
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()

    @jax.jit
    def run(s):
        return verlet_solver.multi_step(s, PARAMS, CFG, grid, 30)[0]
    out = run(state)
    assert bool((out.x < FAR * 0.5).all())
    assert bool(jnp.isfinite(out.x).all())


def test_verlet_recovery_off_keeps_far_contract():
    """With recovery OFF (make_step n=None) an init-sort capacity drop must
    keep the documented counted-loss/FAR contract: pass
    ``collect_spill=False`` to init_dense and the drop never surfaces as a
    frozen phantom (nothing drains the spill when recovery is off)."""
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()
    stepf = jax.jit(verlet_solver.make_step(PARAMS, CFG, grid))  # n=None
    sim = verlet_solver.init_dense(state, grid, collect_spill=False)
    assert int(sim.suspended) == 0
    assert int(sim.overflow) == 1                             # still counted
    x0, *_ = verlet_solver.extract_fields(sim, grid, PARAMS, state.n)
    # the init drop is FAR immediately — NOT a frozen phantom at position
    assert int(jnp.sum(x0 >= FAR * 0.5)) == 1
    for _ in range(20):
        sim = stepf(sim)
    assert int(sim.suspended) == 0                            # never filled
    x, y, vx, vy, rho = verlet_solver.extract_fields(sim, grid, PARAMS,
                                                     state.n)
    far = x >= FAR * 0.5
    # recovery-off semantics: this violent scene also sheds ballistic
    # window losses at rebins — every loss is FAR + counted, none frozen
    assert int(jnp.sum(far)) >= 1
    assert int(sim.overflow + sim.lost) == int(jnp.sum(far))
    # the survivors keep integrating normally
    assert bool(jnp.isfinite(x[~far]).all() & (jnp.abs(vx[~far]) < 1e3).all())


def test_session_recovery_off_contract():
    """Session(recovery=False) is the counted-loss knob for huge scenes
    expected to overflow (the recovery pass costs dense-size scatters and
    HBM headroom at 100M+): drops are counted, the spill buffer stays
    empty (init AND steps), nothing re-admits."""
    grid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8,
                                      skin_factor=1.5)
    state = crowded_state()
    sess = verlet_solver.Session(state, PARAMS, CFG, grid, recovery=False)
    assert int(sess.sim.overflow) == 1 and sess.suspended == 0
    sess.run(20)
    assert sess.overflow >= 1
    assert sess.suspended == 0 and sess.readmitted == 0
    x = sess.state().x
    # losses surface as FAR (counted-loss contract), survivors finite
    far = x >= FAR * 0.5
    assert int(jnp.sum(far)) == sess.overflow
    assert bool(jnp.isfinite(x[~far]).all())
