#!/bin/bash
# Round-5 TPU queue #16: sharded 160M/device with the int8 routing code
# AND the per-slot recovery window test (the two temps that made up the
# 160 MB-over-HBM bracket).
cd /root/repo
echo "=== $(date) sharded 160M/device (int8 code + slot-pad recovery)" >> /tmp/r5_queue16.log
BGF_CODE8=1 timeout 21600 python tools/bench_sharded.py --scale --gen \
    --n 160000000 --devices 1 --capacity-factor 1.0 --chunks 16 \
    --warmup-steps 0 --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160h.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue16.log
echo "=== $(date) queue16 done" >> /tmp/r5_queue16.log
