#!/bin/bash
# Round-5 TPU queue #14: steady-state sharded reads with the per-chunk
# harness (the single-rep averages this boot folded the cold run_k
# compile in - see round5_sharded_timing_artifact).
#   1. 96M/device --gen (expect steady ~147 ms/step; warm artifact).
#   2. 128M/device --gen ref-based (the one point with no clean steady
#      read yet; completes the refless-vs-ref A/B at 128M).
cd /root/repo

echo "=== $(date) sharded 96M/device steady" >> /tmp/r5_queue14.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 96000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard96c.log 2>&1
echo "96M exit=$?" >> /tmp/r5_queue14.log

echo "=== $(date) sharded 128M/device ref-based steady" >> /tmp/r5_queue14.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 --refless off > /tmp/r5_shard128h.log 2>&1
echo "128M-ref exit=$?" >> /tmp/r5_queue14.log
echo "=== $(date) queue14 done" >> /tmp/r5_queue14.log
