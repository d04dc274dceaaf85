#!/bin/bash
# Round-5 TPU queue #15: the int8 routing-code experiment (BGF_CODE8=1;
# the select code plane is the one plane-sized rebin temp with no donor
# left - it kills both the 224M single-chip and the 160M/device sharded
# brackets; int8 shrinks it 4x).
#   1. exp_code8: on-chip bitwise A/B (Mosaic int8 lowering proof).
#   2. probe_hbm 224M with int8 code.
#   3. 224M run if the probe compiles.
#   4. sharded 160M/device --gen with int8 code (was out by 160 MB).
cd /root/repo

echo "=== $(date) exp_code8 bitwise A/B" >> /tmp/r5_queue15.log
timeout 7200 python tools/exp_code8.py > /tmp/r5_code8.log 2>&1
echo "code8 exit=$?" >> /tmp/r5_queue15.log
grep -q '"ok": true' /tmp/r5_code8.log || { echo "code8 failed - stop" >> /tmp/r5_queue15.log; exit 1; }

echo "=== $(date) probe_hbm 224M (int8 code)" >> /tmp/r5_queue15.log
BGF_CODE8=1 timeout 7200 python tools/probe_hbm.py --n 224000000 > /tmp/r5_probe224b.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue15.log

echo "=== $(date) 224M refless (int8 code)" >> /tmp/r5_queue15.log
BGF_CODE8=1 timeout 21600 python tools/bench_scale.py --n 224000000 \
    --warmup-steps 0 --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale224.log 2>&1
echo "224M exit=$?" >> /tmp/r5_queue15.log

echo "=== $(date) sharded 160M/device (int8 code)" >> /tmp/r5_queue15.log
BGF_CODE8=1 timeout 21600 python tools/bench_sharded.py --scale --gen \
    --n 160000000 --devices 1 --capacity-factor 1.0 --chunks 16 \
    --warmup-steps 0 --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160g.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue15.log
echo "=== $(date) queue15 done" >> /tmp/r5_queue15.log
