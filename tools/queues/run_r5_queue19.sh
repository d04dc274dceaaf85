#!/bin/bash
cd /root/repo
echo "=== $(date) sharded 160M/device (unwrapped D=1 rebin)" >> /tmp/r5_queue19.log
BGF_CODE8=1 timeout 14400 python tools/bench_sharded.py --scale --gen \
    --n 160000000 --devices 1 --capacity-factor 1.0 --chunks 16 \
    --warmup-steps 0 --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160k.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue19.log
echo "=== $(date) queue19 done" >> /tmp/r5_queue19.log
