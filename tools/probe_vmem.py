"""Calibrate the fused-kernel scoped-VMEM model on the real compiler.

The wide-grid knobs (`pallas_solver._forces_vmem_est`, `pick_row_block`)
rest on a linear-in-(tb, nx_pad) model of the compiler's scoped-VMEM
demand.  The DMA-scratch part is exact (shape formulas); the compiler's
pair-loop temps are calibrated from ONE tb=8 point (14905 B/lane at
nx_pad 5888).  This probe LOWER+COMPILES (never runs) the fused
forces+integrate kernel at chosen (tb, nx_pad, mode) points against a
tiny vmem_limit so Mosaic reports the true requested bytes in its error
message, and prints a table of model-vs-compiler.

TPU-only (Mosaic lowering); compile-only, so it is safe to run while no
other process holds the chip.

  python tools/probe_vmem.py --points 8:5888:off,4:5888:off,4:6528:full
"""

from __future__ import annotations

import argparse
import dataclasses
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver

_MODE = {"off": False, "xyr": "xyr", "full": True}


def probe(tb: int, nx_pad: int, mode, limit_mib: float) -> tuple[int, str]:
    """Compile the fused kernel at (tb, nx_pad, mode) under limit_mib.
    Returns (reported_bytes_or_-1, status)."""
    # a grid with the requested geometry: nx chosen so nx_pad lands exact
    grid = dataclasses.replace(
        verlet_solver.default_grid(0.045, 0.0, 1.0, y_max=1.0),
        nx=nx_pad - 2, ny=tb * 30, row_block=tb)
    assert grid.nx_pad == nx_pad, grid.nx_pad
    shape = (grid.ny_pad, grid.cap, grid.nx_pad)
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create()

    old_force, old_budget = pallas_solver._DBUF_FORCE, None
    pallas_solver._DBUF_FORCE = mode
    try:
        def fn(xd, yd, vxd, vyd, rho, rx, ry):
            return pallas_solver.forces_integrate_pallas(
                xd, yd, vxd, vyd, rho, rx, ry, params, cfg, grid,
                interpret=False)

        args = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 7
        lowered = jax.jit(fn).lower(*args)
        try:
            lowered.compile()
            return -1, "fits"
        except Exception as e:  # Mosaic reports the request in the message
            msg = str(e)
            m = re.search(r"(\d+) bytes", msg)
            scoped = re.search(r"scoped.{0,40}?(\d[\d,]*)", msg)
            got = int(m.group(1)) if m else -1
            return got, "over: " + msg.splitlines()[0][:160]
    finally:
        pallas_solver._DBUF_FORCE = old_force


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=str,
                    default="8:5888:off,8:5888:xyr,4:5888:off,4:6528:full,"
                            "4:6528:off,4:8064:off")
    ap.add_argument("--limit-mib", type=float, default=100.0)
    args = ap.parse_args()

    print(f"# {'tb':>3} {'nx_pad':>7} {'mode':>5} {'model_MiB':>10} "
          f"{'compiler':>30}")
    for spec in args.points.split(","):
        tb_s, nx_s, mode_s = spec.split(":")
        tb, nx_pad, mode = int(tb_s), int(nx_s), _MODE[mode_s]
        est = pallas_solver._forces_vmem_est(nx_pad, mode, tb) / 2**20
        got, status = probe(tb, nx_pad, mode, args.limit_mib)
        print(f"# {tb:>3} {nx_pad:>7} {mode_s:>5} {est:>10.2f} "
              f"{status[:90]:>30}", flush=True)
    print('{"metric": "probe_vmem", "ok": true}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
