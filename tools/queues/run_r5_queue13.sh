#!/bin/bash
# Round-5 TPU queue #13: bisect the sharded-path regression (96M/device
# read 786 ms/step on current code vs 166.4 on the early-r5 code).
#   1. current code, 1M sharded (not --scale): vs the r4 1.71 ms/step
#      bar - a structural regression shows at any N.
#   2. worktree at 45bb6b1 (pre sharded-refless-port, the code the
#      published 96M number ran): 1M sharded.
#   3. worktree 96M --scale re-read (the exact published invocation).
# Worktree shares /root/.jax_cache (set inside bench scripts).
cd /root/repo
while ! grep -q "queue12 done" /tmp/r5_queue12.log 2>/dev/null; do sleep 30; done

echo "=== $(date) current 1M sharded" >> /tmp/r5_queue13.log
timeout 7200 python tools/bench_sharded.py --n 1000000 --reps 2 \
    > /tmp/r5_shard1m_cur.log 2>&1
echo "cur-1M exit=$?" >> /tmp/r5_queue13.log

echo "=== $(date) 45bb6b1 1M sharded" >> /tmp/r5_queue13.log
(cd /tmp/bisect45 && timeout 7200 python tools/bench_sharded.py \
    --n 1000000 --reps 2 > /tmp/r5_shard1m_old.log 2>&1)
echo "old-1M exit=$?" >> /tmp/r5_queue13.log

echo "=== $(date) 45bb6b1 96M --scale" >> /tmp/r5_queue13.log
(cd /tmp/bisect45 && timeout 14400 python tools/bench_sharded.py --scale \
    --n 96000000 --devices 1 --capacity-factor 1.0 --chunks 16 \
    --warmup-steps 0 --chunk 150 --steps 600 --reps 1 \
    > /tmp/r5_shard96_old.log 2>&1)
echo "old-96M exit=$?" >> /tmp/r5_queue13.log
echo "=== $(date) queue13 done" >> /tmp/r5_queue13.log
