#!/bin/bash
# Round-4 TPU queue #2: strictly sequential (axon claim is exclusive).
cd /root/repo

echo "=== $(date) 136M probe (chunked: bisect 150 avoids the long-dispatch fault)" >> /tmp/r4_queue2.log
timeout 5400 python tools/bench_scale.py --n 136000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale136.log 2>&1
echo "136M exit=$?" >> /tmp/r4_queue2.log

echo "=== $(date) sharded 1M re-read (post psum-skip)" >> /tmp/r4_queue2.log
timeout 3600 python tools/bench_sharded.py --n 1000000 > /tmp/bench_sharded_1m_r4b.log 2>&1
echo "sharded-1M exit=$?" >> /tmp/r4_queue2.log

echo "=== $(date) shard gap isolation (post psum-skip)" >> /tmp/r4_queue2.log
timeout 3600 python tools/exp_shard_gap.py --isolate-rebin > /tmp/gap_r4b.log 2>&1
echo "gap exit=$?" >> /tmp/r4_queue2.log

echo "=== $(date) queue2 done" >> /tmp/r4_queue2.log
