"""MONO-kernel step (density+forces+integrate in one launch) vs the
two-kernel path, interpret mode.

The mono kernel recomputes halo-row density in-VMEM instead of reading the
neighbour program's HBM rho, with the identical (kj, dx, dy) summation
order.  Equality bars:

* rho on LIVE slots: exact.  (FAR slots inside a widened slot bound
  accumulate their r=0 self-pair = the analytic self-density — the
  two-kernel path does the same within occupied windows, mono extends it
  to halo-adjacent empty rows; dead slots are masked at every consumer.)
* positions/velocities: ulp-level (XLA fuses the two programs differently,
  so FMA contraction differs — observed <=2e-11 on x, <=9e-8 on v).

(reference analog: the fused DensityNode dispatches the four passes
back-to-back over shared buffers, src/gpu/pipeline.rs:284-313 — here the
whole step is literally one kernel.)
"""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops import reslot as reslot_ops

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
VGRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0,
                                   cap=8, skin_factor=1.5)


def test_mono_bitwise_matches_two_kernel():
    state = init_grid(24, 24, 0.04)
    sim = verlet_solver.init_dense(state, VGRID)
    occ = reslot_ops.block_kmax3(sim.xd, VGRID)

    rho_ref = pallas_solver.density_pallas(
        sim.xd, sim.yd, PARAMS, VGRID, interpret=True, occ=occ)
    x2, y2, vx2, vy2, d2 = pallas_solver.forces_integrate_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd, rho_ref,
        sim.ref_xd, sim.ref_yd, PARAMS, CFG, VGRID,
        interpret=True, occ=occ)

    xm, ym, vxm, vym, rhom, dm = pallas_solver.mono_step_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd,
        sim.ref_xd, sim.ref_yd, PARAMS, CFG, VGRID,
        interpret=True, occ=occ)

    live = np.asarray(sim.xd) < 5e8
    np.testing.assert_array_equal(np.asarray(rhom)[live],
                                  np.asarray(rho_ref)[live],
                                  err_msg="mono live-slot rho != two-kernel")
    for a, b, name, tol in ((xm, x2, "x", 1e-9), (ym, y2, "y", 1e-9),
                            (vxm, vx2, "vx", 5e-7), (vym, vy2, "vy", 5e-7)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   err_msg=f"mono {name} != two-kernel")
    assert abs(float(dm) - float(d2)) <= 1e-12


def test_mono_edge_blocks_match_two_kernel():
    # particles pushed against the TOP of the domain: the last interior
    # block's widened density window and the clamped slot-bound reads
    # (rm/rp at the grid edges) carry real occupancy
    import jax.numpy as jnp
    import dataclasses
    state = init_grid(24, 24, 0.04)
    state = dataclasses.replace(state, y=state.y + (3.0 - 0.04 * 26))
    sim = verlet_solver.init_dense(state, VGRID)
    occ = reslot_ops.block_kmax3(sim.xd, VGRID)
    rho_ref = pallas_solver.density_pallas(
        sim.xd, sim.yd, PARAMS, VGRID, interpret=True, occ=occ)
    x2, y2, vx2, vy2, d2 = pallas_solver.forces_integrate_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd, rho_ref,
        sim.ref_xd, sim.ref_yd, PARAMS, CFG, VGRID,
        interpret=True, occ=occ)
    xm, ym, vxm, vym, rhom, dm = pallas_solver.mono_step_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd,
        sim.ref_xd, sim.ref_yd, PARAMS, CFG, VGRID,
        interpret=True, occ=occ)
    live = np.asarray(sim.xd) < 5e8
    assert live.any()
    # some occupancy must actually live in the last two interior blocks
    tb = VGRID.row_block
    assert live[-3 * tb:].any(), "scene failed to reach the top blocks"
    np.testing.assert_array_equal(np.asarray(rhom)[live],
                                  np.asarray(rho_ref)[live])
    for a, b, tol in ((xm, x2, 1e-9), (ym, y2, 1e-9),
                      (vxm, vx2, 5e-7), (vym, vy2, 5e-7)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_mono_is_the_small_grid_default():
    # the flagship default step at this grid size takes the mono path;
    # multi-step physics must agree bitwise with the explicit two-kernel
    # stencils route (same arithmetic, different launch structure)
    assert VGRID.n_row_blocks < pallas_solver._MONO_MAX_BLOCKS
    state = init_grid(20, 20, 0.04)
    v_mono, diag, _ = verlet_solver.multi_step(
        state, PARAMS, CFG, VGRID, 25)          # stencils=None -> mono
    stencils = pallas_solver.make_stencils(VGRID, interpret=True)
    v_two, diag2, _ = verlet_solver.multi_step(
        state, PARAMS, CFG, VGRID, 25, stencils=stencils)
    assert int(diag.overflow) == 0 and int(diag2.overflow) == 0
    # stencils route uses the UNFUSED forces+XLA integrate glue: identical
    # pair sums but different integrate rounding context — allclose bar
    np.testing.assert_allclose(np.asarray(v_mono.x), np.asarray(v_two.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_mono.rho), np.asarray(v_two.rho),
                               rtol=1e-6)
