"""Inspect the rebin lax.cond's buffer behavior in optimized HLO (CPU).

The no-cond floor measurement (BASELINE.md round-4) shows the sharded D=1
BASE step at flagship parity; the residual D=1 gap is the rebin cond.
The hypothesis: XLA forwards/aliases the untaken branch's plane buffers in
the flagship conditional but inserts full-plane copies in the sharded one
(different carry structure).  This compiles both 100-step scans on CPU and
counts the dense-plane-shaped `copy` instructions inside `conditional`
branch computations — a structural diagnostic, not a timing.

  python tools/exp_cond_hlo.py --n 10000
"""

from __future__ import annotations

import argparse
import math
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import verlet_solver
from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet


def copies_in(hlo: str, plane_re: str):
    """Count copy/fusion-emitted full-plane materializations per computation
    that belongs to a conditional branch (name contains 'true' / 'false' /
    'branch'), plus the total copy count."""
    out = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w.\-]+)\s*(?:\([^)]*\))?\s*(?:->|{)", line.strip())
        if line.startswith(("%", "ENTRY")) or (line and not line[0].isspace()):
            m2 = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)", line.strip())
            if m2:
                cur = m2.group(1)
        if re.search(rf"copy\(.*\)|copy\.\d+ = {plane_re}", line) \
                and "copy" in line and re.search(plane_re, line):
            out.setdefault(cur, 0)
            out[cur] += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--dump", action="store_true",
                    help="write both optimized HLOs to /tmp for diffing")
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    extent = side * 0.04
    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    state = bgf.init_grid(side, side, 0.04)

    grid = verlet_solver.default_grid(params.h, -1.0, extent + 1.0,
                                      extent * 1.1 + 1.0, skin_factor=1.75)
    # CPU runs the XLA stencils (fused=False equivalents compile in
    # interpret mode anyway; the cond structure is solver-side, identical)
    fstep = verlet_solver.make_step(params, cfg, grid, n=n)
    fsim = jax.jit(lambda s: verlet_solver.init_dense(s, grid))(state)

    def scan(step):
        def run(sim):
            return jax.lax.scan(lambda s, _: (step(s), None), sim, None,
                                length=args.iters)[0]
        return run

    fl = jax.jit(scan(fstep)).lower(fsim).compile()
    fh = fl.as_text()

    spec = shard.ShardSpec.build(h=0.045 * 1.75, x_min=-1.0,
                                 x_max=extent + 1.0,
                                 y_max=extent * 1.1 + 1.0, n_devices=1,
                                 capacity=n * 2)
    mesh = shard.make_mesh(1)
    init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
        params, cfg, spec, mesh, fused=True, n=n)
    ssim = init_fn(shard.shard_state(state, spec))
    sl = jax.jit(scan(step_fn)).lower(ssim).compile()
    sh_h = sl.as_text()

    ny = grid.ny_pad
    plane_re = rf"f32\[\d*,?{ny},8,\d+\]|f32\[{ny},8,\d+\]|s32\[{ny},8,\d+\]"
    # sharded planes have their own ny; derive from the sharded sim
    sny = ssim.xd.shape[-3] if hasattr(ssim, "xd") else None

    for name, hlo in (("flagship", fh), ("sharded-D1", sh_h)):
        conds = len(re.findall(r"conditional\(", hlo))
        # count plane-shaped copies inside branch computations
        branch_copies = 0
        total_copies = 0
        for line in hlo.splitlines():
            if " copy(" in line and re.search(r"f32\[\d+,8,\d+\]|s32\[\d+,8,\d+\]", line):
                total_copies += 1
        print(f"{name:12s} conditionals={conds:3d} "
              f"plane-shaped copies total={total_copies}")
        if args.dump:
            path = f"/tmp/hlo_{name}.txt"
            with open(path, "w") as f:
                f.write(hlo)
            print(f"  dumped {path}")


if __name__ == "__main__":
    main()
