#!/bin/bash
# Round-4 TPU queue #5: waits for queue #4 (144M/160M), then re-reads the
# sharded D=1 glue gap after the jit-level rebin-cond hoist (90a71a3).
cd /root/repo
while ! grep -q "queue4 done" /tmp/r4_queue4.log 2>/dev/null; do sleep 60; done

echo "=== $(date) sharded 1M re-read (post cond-hoist)" >> /tmp/r4_queue5.log
timeout 5400 python tools/bench_sharded.py --n 1000000 > /tmp/bench_sharded_1m_r4c.log 2>&1
echo "sharded-1M exit=$?" >> /tmp/r4_queue5.log

echo "=== $(date) shard gap isolation (post cond-hoist)" >> /tmp/r4_queue5.log
timeout 5400 python tools/exp_shard_gap.py > /tmp/gap_r4c.log 2>&1
echo "gap exit=$?" >> /tmp/r4_queue5.log

echo "=== $(date) sharded 4M re-read (post cond-hoist)" >> /tmp/r4_queue5.log
timeout 5400 python tools/bench_sharded.py --n 4000000 > /tmp/bench_sharded_4m_r4c.log 2>&1
echo "sharded-4M exit=$?" >> /tmp/r4_queue5.log
echo "=== $(date) queue5 done" >> /tmp/r4_queue5.log
