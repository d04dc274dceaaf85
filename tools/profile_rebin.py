"""Micro-profile of rebin internals + cond overhead + extract candidates.

Validates the dense-reslot redesign: where do the 48 ms (1M) go, what does a
cond-free step cost, and how expensive is a dense->per-particle scatter
(the proposed on-demand extraction)?
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import bevy_gpu_fluid_tpu as bgf
from bevy_gpu_fluid_tpu.models import pallas_solver, verlet_solver
from bevy_gpu_fluid_tpu.ops import binning


def scan_time(body, init, iters: int, reps: int = 3) -> float:
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)[0]
    jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    side = int(math.isqrt(args.n))
    n = side * side
    state = bgf.init_grid(side, side, 0.04)
    params = bgf.FluidParams.demo()
    extent = side * 0.04
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=extent + 1.0)
    grid = verlet_solver.default_grid(0.045, -1.0, extent + 1.0,
                                      y_max=extent * 1.1 + 1.0, cap=8)
    sim0 = verlet_solver.init_dense(state, grid)
    it = args.iters

    def report(name, sec):
        print(f"{name:38s} {sec * 1e3:8.3f} ms", file=sys.stderr)

    x, y, vx, vy = state.x, state.y, state.vx, state.vy

    # --- rebin internals (per-particle domain) ---
    def sort_body(c):
        x, s = c
        cid = (x * 100).astype(jnp.int32)
        perm = jnp.argsort(cid + (s & 1), stable=True)
        return x + perm[0] * 1e-30, s + 1
    report("argsort 1x [N]", scan_time(sort_body, (x, jnp.int32(0)), it))

    b = binning.bin_particles(x, y, grid, with_csr=False)

    def scatter_body(c):
        xx, s = c
        xd = binning.to_dense(b, xx, fill=binning.FAR)
        return xx + xd[0, 0, 0] * 1e-30, s + 1
    report("to_dense scatter 1 field", scan_time(
        scatter_body, (x, jnp.int32(0)), it))

    def gather_body(c):
        xx, s = c
        vals = binning.gather_slots(grid, b.cx, b.cy, b.rank,
                                    [sim0.xd, sim0.yd, sim0.vxd, sim0.vyd],
                                    [binning.FAR, binning.FAR, 0.0, 0.0])
        return xx + vals[0][0] * 1e-30, s + 1
    report("fused 4-field gather", scan_time(
        gather_body, (x, jnp.int32(0)), it))

    def binp_body(c):
        xx, s = c
        bb = binning.bin_particles(xx, y, grid, with_csr=False)
        return xx + bb.rank[0] * 1e-30, s + 1
    report("bin_particles (sort+rank scatter)", scan_time(
        binp_body, (x, jnp.int32(0)), it))

    # --- cond overhead: step WITHOUT the rebin cond ---
    density_fn, forces_fn = pallas_solver.make_stencils(grid)

    def step_nocond(sim):
        live = sim.xd < binning.FAR * 0.5
        rho_d = density_fn(sim.xd, sim.yd, params)
        ax_d, ay_d = forces_fn(sim.xd, sim.yd, sim.vxd, sim.vyd, rho_d,
                               params)
        ay_d = ay_d - 9.81
        vx = sim.vxd + ax_d * cfg.dt
        vy = sim.vyd + ay_d * cfg.dt
        xx = sim.xd + vx * cfg.dt
        yy = sim.yd + vy * cfg.dt
        dx = xx - sim.ref_xd
        dy = yy - sim.ref_yd
        disp2 = jnp.max(dx * dx + dy * dy)
        return dataclasses.replace(
            sim, xd=jnp.where(live, xx, sim.xd) + disp2 * 1e-30,
            yd=jnp.where(live, yy, sim.yd),
            vxd=jnp.where(live, vx, 0.0), vyd=jnp.where(live, vy, 0.0),
            rho_d=rho_d, age=sim.age + 1, step=sim.step + 1)
    report("verlet step WITHOUT cond", scan_time(step_nocond, sim0, it))

    stepf = verlet_solver.make_step(params, cfg, grid)
    report("verlet step WITH cond (no fire)", scan_time(stepf, sim0, it))

    # --- extract candidates ---
    idx_d = binning.to_dense(b, jnp.arange(n, dtype=jnp.float32), fill=-1.0)
    real = jax.lax.slice(
        idx_d, (grid.row0, 0, 1), (grid.row0 + grid.ny, grid.cap,
                                   1 + grid.nx))
    xr = jax.lax.slice(
        sim0.xd, (grid.row0, 0, 1), (grid.row0 + grid.ny, grid.cap,
                                     1 + grid.nx))
    flat_idx = real.reshape(-1).astype(jnp.int32)
    flat_x = xr.reshape(-1)
    print(f"# real slots = {flat_idx.shape[0] / 1e6:.2f} M", file=sys.stderr)

    def dscatter_body(c):
        out, s = c
        safe = jnp.where(flat_idx >= 0, flat_idx, n + (1 << 20))
        o = jnp.zeros((n,), jnp.float32).at[safe].set(flat_x, mode="drop")
        return out + o[0] * 1e-30, s + 1
    report("dense->particle scatter (1 field)", scan_time(
        dscatter_body, (jnp.zeros((n,)), jnp.int32(0)),
        max(3, it // 5)))

    # stacked variant: 4 fields through one scatter of the slot domain
    def dscatter4_body(c):
        out, s = c
        safe = jnp.where(flat_idx >= 0, flat_idx, n + (1 << 20))
        stacked = jnp.stack([flat_x, flat_x, flat_x, flat_x], -1)
        o = jnp.zeros((n, 4), jnp.float32).at[safe].set(stacked, mode="drop")
        return out + o[0, 0] * 1e-30, s + 1
    report("dense->particle scatter (4 stacked)", scan_time(
        dscatter4_body, (jnp.zeros((n,)), jnp.int32(0)),
        max(3, it // 5)))


if __name__ == "__main__":
    main()
