"""In-engine validator (readback_and_compare analog) tests."""

import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import grid_solver
from bevy_gpu_fluid_tpu.utils.validator import ParityError, validate

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
GRID = grid_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)


def test_validator_passes_on_accelerated_state():
    state = init_grid(16, 16, 0.04)
    state, _ = grid_solver.multi_step(state, PARAMS, CFG, GRID, 20)
    # recompute fields at the final positions so they're self-consistent
    state, _ = grid_solver.compute_rho_p_acc(state, PARAMS, GRID)
    report = validate(state, PARAMS)
    assert report.rho_max_rel <= 0.01


def test_validator_catches_corruption():
    state = init_grid(16, 16, 0.04)
    state, _ = grid_solver.compute_rho_p_acc(state, PARAMS, GRID)
    bad = state.replace(rho=state.rho * 1.05)   # 5% corruption
    with pytest.raises(ParityError):
        validate(bad, PARAMS)


def test_validate_accelerated_covers_acc_for_verlet_state():
    """Round-2 gap #4: the runtime validator checked rho/p only for the
    flagship (verlet states carry no accelerations).  validate_accelerated
    re-evaluates rho/p/AND acc through the production stencils and gates
    them at the reference's in-engine tolerances (1% rel + 0.5 abs acc,
    reference: src/gpu/buffers.rs:564-567)."""
    from bevy_gpu_fluid_tpu.models import verlet_solver
    from bevy_gpu_fluid_tpu.utils.validator import validate_accelerated

    vgrid = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)
    state = init_grid(16, 16, 0.04)
    state, _, _ = verlet_solver.multi_step(state, PARAMS, CFG, vgrid, 20)
    report = validate_accelerated(state, PARAMS, vgrid)
    # acc really was checked (non-degenerate accelerations in a dam break)
    assert report.acc_max_abs <= 0.5 or report.acc_max_rel <= 0.01
    assert report.rho_max_rel <= 0.01


def test_simulation_validate_every_runs_full_check_for_verlet():
    """Simulation(validate_every=K) with solver='verlet' exercises the
    acc-covering validator on the runtime path."""
    from bevy_gpu_fluid_tpu import Simulation

    sim = Simulation.dam_break(n=256, solver="verlet", validate_every=10)
    sim.run(10)
    assert sim.last_parity is not None
    # full mode populated the acceleration metrics (fields-only mode
    # leaves them at exactly 0.0)
    assert sim.last_parity.acc_max_abs > 0.0
    assert sim.last_parity.rho_max_rel <= 0.01


def test_validate_accelerated_catches_kernel_divergence():
    """A stencil that disagrees with the golden model must trip the check
    (guards against validate_accelerated silently comparing the golden
    model with itself)."""
    from bevy_gpu_fluid_tpu.utils.validator import validate_accelerated

    def bad_forces(xd, yd, vxd, vyd, rho_d, params):
        ax, ay = grid_solver.forces_xla(xd, yd, vxd, vyd, rho_d, params)
        return ax * 1.5, ay * 1.5
    state = init_grid(16, 16, 0.04)
    state, _ = grid_solver.multi_step(state, PARAMS, CFG, GRID, 5)
    with pytest.raises(ParityError):
        validate_accelerated(state, PARAMS, GRID,
                             stencils=(grid_solver.density_xla, bad_forces))
