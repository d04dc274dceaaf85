#!/bin/bash
# Round-5 TPU queue #5: sharded per-device ceiling march on the refless
# posture (ShardedSession auto-engages refless past ~150M local grid).
# 96M/device published (round5_sharded_scale_96M_D1); march 128M -> 160M
# to close per-device parity with the flagship's refless ceiling.
# Generous timeouts: never kill during PJRT claim/compile (r3 incident).
cd /root/repo

echo "=== $(date) sharded 128M/device D=1" >> /tmp/r5_queue5.log
timeout 21600 python tools/bench_sharded.py --scale --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128.log 2>&1
echo "128M exit=$?" >> /tmp/r5_queue5.log

echo "=== $(date) sharded 160M/device D=1" >> /tmp/r5_queue5.log
timeout 21600 python tools/bench_sharded.py --scale --n 160000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue5.log
echo "=== $(date) queue5 done" >> /tmp/r5_queue5.log
