#!/bin/bash
# Round-5 TPU queue #11: definitive sharded per-device reads.
#   1. sharded 160M/device --gen retry with the ShardSpec width-adaptive
#      row blocks (the queue-8 fault was the fused kernel's scoped VMEM
#      at tb=8 / nx_pad 6528 — the local grid now drops to tb=4 like the
#      flagship's default_grid).
#   2. sharded 128M/device fair steady-state read (every earlier read ran
#      against the cold-cache CPU test suite on the single core, which
#      starves the chunked dispatch loop's host side; run this queue with
#      the box otherwise idle).
cd /root/repo
while ! grep -q "queue10 done" /tmp/r5_queue10.log 2>/dev/null; do sleep 30; done

echo "=== $(date) sharded 160M/device D=1 (--gen, tb=4 fix)" >> /tmp/r5_queue11.log
timeout 21600 python tools/bench_sharded.py --scale --gen --n 160000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160f.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue11.log

echo "=== $(date) sharded 128M/device fair read" >> /tmp/r5_queue11.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128f.log 2>&1
echo "128M exit=$?" >> /tmp/r5_queue11.log
echo "=== $(date) queue11 done" >> /tmp/r5_queue11.log
