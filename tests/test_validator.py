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
