"""DMA-mode equivalence for the fused forces+integrate kernel.

The kernel has three slab-DMA modes, chosen statically from the grid size
(`pallas_solver._dbuf`): single-buffered (small grids), fully
double-buffered (the +10-17% cross-program prefetch), and PARTIAL
double-buffering ("xyr": only x/y/rho get the second slot + prefetch) for
grids too wide for two slots of everything under the 100 MiB scoped-VMEM
gate (the 96M-128M widths).  All three must produce bitwise-identical
outputs — the mode only changes WHEN bytes move, never what is computed.
CI pins that in interpret mode by forcing each mode on the same scene.

(reference analog: none — the reference's WGSL kernels had no slab DMA or
prefetch tiers; this guards TPU-side machinery the rebuild added.)
"""

import numpy as np
import pytest

from bevy_gpu_fluid_tpu import FluidParams, IntegrateConfig, init_grid
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops import reslot as reslot_ops

PARAMS = FluidParams.demo()
CFG = IntegrateConfig.create(x_min=-1.0, x_max=2.5)
VGRID = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0,
                                   cap=8, skin_factor=1.5)


def _run_fused(monkeypatch, min_blocks, max_lanes):
    monkeypatch.setattr(pallas_solver, "_DBUF_MIN_BLOCKS", min_blocks)
    monkeypatch.setattr(pallas_solver, "_DBUF_MAX_LANES", max_lanes)
    state = init_grid(24, 24, 0.04)
    sim = verlet_solver.init_dense(state, VGRID)
    occ = reslot_ops.block_kmax3(sim.xd, VGRID)
    rho = pallas_solver.density_pallas(
        sim.xd, sim.yd, PARAMS, VGRID, interpret=True, occ=occ)
    return pallas_solver.forces_integrate_pallas(
        sim.xd, sim.yd, sim.vxd, sim.vyd, rho,
        sim.ref_xd, sim.ref_yd, PARAMS, CFG, VGRID,
        interpret=True, occ=occ)


def test_dbuf_modes_bitwise_identical(monkeypatch):
    # force each mode on the same (small) grid: single-buffered is the
    # uncontested baseline; full dbuf needs min_blocks <= nb; xyr
    # additionally needs max_lanes < nx_pad
    assert pallas_solver._dbuf(VGRID) is False          # natural default
    single = _run_fused(monkeypatch, 10**9, 10**9)
    full = _run_fused(monkeypatch, 0, 10**9)
    xyr = _run_fused(monkeypatch, 0, 0)
    for got, name in ((full, "full-dbuf"), (xyr, "xyr")):
        for a, b, field in zip(got, single, ("x", "y", "vx", "vy", "disp2")):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} {field} != single-buffered")


def test_dbuf_mode_selection():
    # the static chooser: small grids single-buffer, deep grids full-dbuf,
    # deep AND wide grids partial-dbuf; density never width-gates
    import dataclasses

    deep = dataclasses.replace(VGRID)  # copy to probe attributes
    assert pallas_solver._dbuf_density(VGRID) is False
    nb_ok = pallas_solver._DBUF_MIN_BLOCKS
    wide = pallas_solver._DBUF_MAX_LANES

    class G:  # minimal grid stand-in for the chooser
        def __init__(self, nb, nx):
            self.n_row_blocks, self.nx_pad = nb, nx

    assert pallas_solver._dbuf(G(nb_ok - 1, 128)) is False
    assert pallas_solver._dbuf(G(nb_ok, wide)) is True
    assert pallas_solver._dbuf(G(nb_ok, wide + 128)) == "xyr"
    assert pallas_solver._dbuf_density(G(nb_ok, wide + 128)) is True
    assert deep.cap == 8
