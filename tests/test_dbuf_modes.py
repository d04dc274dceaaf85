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


def _run_fused(monkeypatch, force):
    monkeypatch.setattr(pallas_solver, "_DBUF_FORCE", force)
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
    # force each mode on the same (small) grid via the _DBUF_FORCE knob:
    # single-buffered is the uncontested baseline
    assert pallas_solver._dbuf(VGRID) is False          # natural default
    single = _run_fused(monkeypatch, False)
    full = _run_fused(monkeypatch, True)
    xyr = _run_fused(monkeypatch, "xyr")
    for got, name in ((full, "full-dbuf"), (xyr, "xyr")):
        for a, b, field in zip(got, single, ("x", "y", "vx", "vy", "disp2")):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} {field} != single-buffered")


def test_dbuf_mode_selection():
    # the static chooser: small grids single-buffer, deep grids pick the
    # widest DMA overlap whose scoped-VMEM estimate fits under the 100 MiB
    # gate (full -> xyr -> single); density never width-gates
    import dataclasses

    deep = dataclasses.replace(VGRID)  # copy to probe attributes
    assert pallas_solver._dbuf_density(VGRID) is False
    nb_ok = pallas_solver._DBUF_MIN_BLOCKS

    class G:  # minimal grid stand-in for the chooser
        def __init__(self, nb, nx, tb=8):
            self.n_row_blocks, self.nx_pad, self.row_block = nb, nx, tb

    assert pallas_solver._dbuf(G(nb_ok - 1, 128)) is False
    # measured anchor points of the VMEM model (see pallas_solver):
    assert pallas_solver._dbuf(G(nb_ok, 5120)) is True      # full fits (r3)
    assert pallas_solver._dbuf(G(nb_ok, 5632)) == "xyr"     # 96M/120M grids
    assert pallas_solver._dbuf(G(nb_ok, 5888)) is False     # 128M: xyr was
    # 102.76 MiB > the 100 MiB gate (compiler-measured) -> single-buffered
    assert pallas_solver._dbuf_density(G(nb_ok, 5888)) is True
    # the estimate reproduces the compiler's scoped-VMEM report at 5888
    assert abs(pallas_solver._forces_vmem_est(5888, "xyr")
               - 102.76 * 2**20) < 0.3 * 2**20
    assert deep.cap == 8
    # the exact scratch formulas reproduce the r4-calibrated tb=8 constants
    assert pallas_solver._scratch_b_per_lane(True, 8) == 4544
    assert pallas_solver._scratch_b_per_lane("xyr", 8) == 3392
    assert pallas_solver._scratch_b_per_lane(False, 8) == 2432
    # width-adaptive row blocks: tb=8 through the proven 136M edge
    # (nx_pad 6016), 4-row blocks past it
    assert pallas_solver.pick_row_block(5888) == 8
    assert pallas_solver.pick_row_block(6016) == 8
    assert pallas_solver.pick_row_block(6144) == pallas_solver._TB_WIDE
    assert pallas_solver.pick_row_block(6528) == pallas_solver._TB_WIDE
    # at tb=4 the model says the 160M width (nx_pad ~6528) fits even fully
    # double-buffered under the gate
    assert pallas_solver._dbuf(G(nb_ok, 6528, tb=4)) is True


def test_tb4_matches_tb8(monkeypatch):
    """4-row blocks (the >6016-lane wide-grid mode) are bitwise the same
    trajectory as the default 8-row blocks: tb only changes how rows are
    tiled onto programs, never the per-cell pair order.  Mono is forced
    off — at this scene's size tb=8 would pick the mono kernel (a
    DIFFERENT, ulp-pinned-not-bitwise path) while tb=4 wouldn't, and the
    wide grids this lever targets never run mono anyway."""
    import dataclasses

    monkeypatch.setattr(pallas_solver, "_MONO_MAX_BLOCKS", 0)
    state = init_grid(24, 24, 0.04)
    g8 = VGRID
    g4 = dataclasses.replace(VGRID, row_block=4)
    assert g8.row_block == 8 and g4.ny_pad != g8.ny_pad
    a = verlet_solver.Session(state, PARAMS, CFG, g8)
    b = verlet_solver.Session(state, PARAMS, CFG, g4)
    a.run(30)
    b.run(30)
    assert int(a.sim.rebin_count) >= 1   # at least one rebin covered
    assert int(a.sim.rebin_count) == int(b.sim.rebin_count)
    ga, gb = a.state(), b.state()
    for f in ("x", "y", "vx", "vy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ga, f)), np.asarray(getattr(gb, f)),
            err_msg=f"tb=4 {f} != tb=8")
    assert a.overflow == 0 and b.overflow == 0


def test_density_rho_out_alias_bitwise():
    """``density_pallas(rho_out=dead)`` writes the new rho over the dead
    plane's buffer (input_output_aliases) — the HBM-wall lever that sheds
    one plane-footprint from the step peak at >=160M particles.  The alias
    must never change a value: bitwise vs the fresh-output call, both at
    the kernel level and through 25 full two-kernel Session steps."""
    import jax.numpy as jnp

    state = init_grid(24, 24, 0.04)
    sim = verlet_solver.init_dense(state, VGRID)
    occ = reslot_ops.block_kmax3(sim.xd, VGRID)
    fresh = pallas_solver.density_pallas(
        sim.xd, sim.yd, PARAMS, VGRID, interpret=True, occ=occ)
    dead = jnp.full_like(fresh, 123.0)  # garbage: must be fully overwritten
    aliased = pallas_solver.density_pallas(
        sim.xd, sim.yd, PARAMS, VGRID, interpret=True, occ=occ,
        rho_out=dead)
    np.testing.assert_array_equal(np.asarray(aliased), np.asarray(fresh))

    # step-level: custom two-kernel stencils alias by default (make_stencils
    # exposes rho_out); hiding the kwarg disables it — trajectories bitwise
    st = pallas_solver.make_stencils(VGRID, interpret=True)
    d0, f0 = st
    hidden = (lambda xd, yd, p, occ=None: d0(xd, yd, p, occ=occ), f0)
    a = verlet_solver.Session(init_grid(24, 24, 0.04), PARAMS, CFG, VGRID,
                              stencils=st)
    b = verlet_solver.Session(init_grid(24, 24, 0.04), PARAMS, CFG, VGRID,
                              stencils=hidden)
    a.run(25)
    b.run(25)
    for f in ("xd", "yd", "vxd", "vyd", "rho_d"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.sim, f)), np.asarray(getattr(b.sim, f)),
            err_msg=f"rho_out alias changed {f}")


def test_density_capability_flag():
    """make_stencils declares rho_out support explicitly — _build_step keys
    the HBM-ceiling alias off this attribute, so wrapping the stencil (jit /
    partial with **kwargs) can re-attach it instead of silently losing the
    alias to signature sniffing (ADVICE r4)."""
    import functools
    d, _ = pallas_solver.make_stencils(VGRID, interpret=True)
    assert d.supports_rho_out is True
    w = functools.partial(d)        # wrappers can carry the flag forward
    w.supports_rho_out = d.supports_rho_out
    assert w.supports_rho_out
