#!/bin/bash
# Round-5 TPU queue #9: warm-cache re-reads for fair steady-state timing
# (queue-7/8 first runs carried the post-reboot cold compile in their
# single-rep inclusive windows), then the 1M headline to confirm the
# donor-chain/reslot edits are perf-neutral at flagship size and warm
# the cache for the driver's end-of-round bench.
cd /root/repo
while ! grep -q "queue8 done" /tmp/r5_queue8.log 2>/dev/null; do sleep 30; done

echo "=== $(date) sharded 128M/device warm re-read" >> /tmp/r5_queue9.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128e.log 2>&1
echo "128M exit=$?" >> /tmp/r5_queue9.log

if grep -q '"ok": true' /tmp/r5_shard160d.log 2>/dev/null; then
    echo "=== $(date) sharded 160M/device warm re-read" >> /tmp/r5_queue9.log
    timeout 14400 python tools/bench_sharded.py --scale --gen --n 160000000 \
        --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
        --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160e.log 2>&1
    echo "160M exit=$?" >> /tmp/r5_queue9.log
fi

echo "=== $(date) bench 1M headline" >> /tmp/r5_queue9.log
timeout 7200 python bench.py > /tmp/r5_bench1m.log 2>&1
echo "bench exit=$?" >> /tmp/r5_queue9.log
echo "=== $(date) queue9 done" >> /tmp/r5_queue9.log
