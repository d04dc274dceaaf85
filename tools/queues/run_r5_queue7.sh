#!/bin/bash
# Round-5 TPU queue #7: the donor-chain rebin (rotated rebin_one: each
# planar apply writes into the previous plane's dead buffer, rho seeding
# the chain — no must-alias self-pairing, no full-plane input copies).
#   1. probe_hbm 192M — rebin_one accounting with the chain (queue-6
#      probe: 19.92 GiB, 4 copied planes).
#   2. 192M refless run.
#   3. sharded 128M/device --gen rerun (the queue-6 run FINISHED its 600
#      steps and then RESOURCE_EXHAUSTED in the eager identity check,
#      now a single fused jit program).
cd /root/repo

echo "=== $(date) probe_hbm 192M (donor chain)" >> /tmp/r5_queue7.log
timeout 7200 python tools/probe_hbm.py --n 192000000 > /tmp/r5_probe192b.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue7.log

echo "=== $(date) 192M refless (donor chain)" >> /tmp/r5_queue7.log
timeout 21600 python tools/bench_scale.py --n 192000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale192c.log 2>&1
echo "192M exit=$?" >> /tmp/r5_queue7.log

echo "=== $(date) sharded 128M/device D=1 (--gen, jit diag)" >> /tmp/r5_queue7.log
timeout 21600 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128c.log 2>&1
echo "128M exit=$?" >> /tmp/r5_queue7.log
echo "=== $(date) queue7 done" >> /tmp/r5_queue7.log
