#!/bin/bash
cd /root/repo
echo "=== $(date) sharded 160M/device (code-based D=1 rebin)" >> /tmp/r5_queue20.log
BGF_CODE8=1 timeout 14400 python tools/bench_sharded.py --scale --gen \
    --n 160000000 --devices 1 --capacity-factor 1.0 --chunks 16 \
    --warmup-steps 0 --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160l.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue20.log
echo "=== $(date) queue20 done" >> /tmp/r5_queue20.log
