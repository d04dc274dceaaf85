#!/bin/bash
# Round-5 TPU queue #6: retry the two queue-4/5 faults with their fixes.
#   1. probe_hbm 192M — compile-only accounting of rebin_one after the
#      collect-cond restructure (the fault was 3.3 GiB of plane
#      copy-protection + 2.1 GiB cond/while temps; fixed if TEMP shrinks
#      by ~the copies).  Also warms the program cache before long jobs.
#   2. 192M refless run (queue-4 design point).
#   3./4. sharded march at 128M and 160M per device with --gen (the
#      generator init: no [N]/[D,capacity] init inputs on device — the
#      queue-5 init OOM).
# Timeouts sized so a kill can never land during PJRT claim/compile.
cd /root/repo

echo "=== $(date) probe_hbm 192M (post-restructure)" >> /tmp/r5_queue6.log
timeout 7200 python tools/probe_hbm.py --n 192000000 > /tmp/r5_probe192.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue6.log

echo "=== $(date) 192M refless" >> /tmp/r5_queue6.log
timeout 21600 python tools/bench_scale.py --n 192000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale192b.log 2>&1
echo "192M exit=$?" >> /tmp/r5_queue6.log

echo "=== $(date) sharded 128M/device D=1 (--gen)" >> /tmp/r5_queue6.log
timeout 21600 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128b.log 2>&1
echo "128M exit=$?" >> /tmp/r5_queue6.log

echo "=== $(date) sharded 160M/device D=1 (--gen)" >> /tmp/r5_queue6.log
timeout 21600 python tools/bench_sharded.py --scale --gen --n 160000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160b.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue6.log
echo "=== $(date) queue6 done" >> /tmp/r5_queue6.log
