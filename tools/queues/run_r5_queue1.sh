#!/bin/bash
# Round-5 TPU queue #1.
# Ordering per the r4 advisor: the first job (bench --fps) warms the
# compile cache with small programs before any long-timeout job, and every
# timeout is sized so a kill can only land mid-run, never during PJRT
# claim/first-compile (the r3 lease-wedge incident).
#
# 1. FPS table on the resident facade engine (VERDICT r5 #1) + the 1M
#    differential headline (regression check for the facade change).
# 2. 160M on the chip (VERDICT r5 #2): segmented posture + rho_out alias +
#    generator init, run(chunk)-style bisect dispatches.
# 3. 176M bracket probe (expected marginal; a fault brackets the ceiling).
cd /root/repo

echo "=== $(date) fps + 1M headline" >> /tmp/r5_queue1.log
timeout 7200 python bench.py --fps > /tmp/r5_fps.log 2>&1
echo "fps exit=$?" >> /tmp/r5_queue1.log

echo "=== $(date) 160M (segmented posture)" >> /tmp/r5_queue1.log
timeout 21600 python tools/bench_scale.py --n 160000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale160.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue1.log

echo "=== $(date) 176M probe" >> /tmp/r5_queue1.log
timeout 14400 python tools/bench_scale.py --n 176000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale176.log 2>&1
echo "176M exit=$?" >> /tmp/r5_queue1.log
echo "=== $(date) queue1 done" >> /tmp/r5_queue1.log
