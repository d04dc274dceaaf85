"""A/B the fused forces kernel's pair-loop lowering (VERDICT r4 #4).

The production kernel bounds its j-slot loop with a dynamic SMEM kmax
(occupancy-adaptive fori): every iteration issues 6 DYNAMIC sublane reads
plus loop bookkeeping — the suspected source of the kernel's ~30% VPU
roofline residual (BASELINE.md: 1.48 ms vs a 1.04 ms bound at 1M).  This
experiment measures the alternatives end-to-end with bench.py's own
differential window (the r3 lesson: standalone kernel harnesses lie —
their scan keep-alives dominate):

  fori    — production baseline
  unroll  — full static unroll over cap (static reads, no adaptivity)
  bucket  — static unrolls at depths {2,4,6,8} picked per block from the
            SMEM kmax (static reads AND coarse adaptivity)

  python tools/exp_pairloop.py --modes fori,unroll,bucket
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (sets jax cache config at import)
from bevy_gpu_fluid_tpu.models import pallas_solver  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="fori,unroll,bucket")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--skin", type=float, default=1.75)
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat the whole per-mode measurement (each rep "
                    "is itself best-of-3 inside bench_case)")
    args = ap.parse_args()

    results = {}
    for mode in args.modes.split(","):
        pallas_solver._PAIR_LOOP = mode
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            r = bench.bench_case(args.n, args.steps, verbose=True,
                                 skin=args.skin)
            r["wall"] = time.time() - t0
            if best is None or r["ms_per_step"] < best["ms_per_step"]:
                best = r
        results[mode] = best
        print(f"## {mode}: {best['ms_per_step']:.3f} ms/step "
              f"({best['rate'] / 1e6:.1f}M pps, overflow "
              f"{best['overflow']})", file=sys.stderr, flush=True)
    base = results.get("fori")
    for mode, r in results.items():
        rel = (f" ({r['ms_per_step'] / base['ms_per_step']:.3f}x of fori)"
               if base and mode != "fori" else "")
        print(f"{mode}: {r['ms_per_step']:.3f} ms/step{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
