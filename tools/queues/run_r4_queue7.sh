#!/bin/bash
# Round-4 TPU queue #7: re-runs queue #5's interrupted 4M sharded re-read
# (post cond-hoist), then queue #6's plan: 160M with the generator init
# (5ab3f3c — no [N] planes on device), and 176M if 160M runs clean.
cd /root/repo

echo "=== $(date) sharded 4M re-read (post cond-hoist)" >> /tmp/r4_queue7.log
timeout 5400 python tools/bench_sharded.py --n 4000000 > /tmp/bench_sharded_4m_r4c.log 2>&1
echo "sharded-4M exit=$?" >> /tmp/r4_queue7.log

echo "=== $(date) 160M (generator init)" >> /tmp/r4_queue7.log
timeout 9000 python tools/bench_scale.py --n 160000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale160_c.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue7.log

if [ $rc -eq 0 ]; then
  echo "=== $(date) 176M probe (generator init)" >> /tmp/r4_queue7.log
  timeout 9000 python tools/bench_scale.py --n 176000000 --warmup-steps 0 --bisect 150 \
      --steps 600 --reps 1 > /tmp/scale176.log 2>&1
  echo "176M exit=$?" >> /tmp/r4_queue7.log
fi
echo "=== $(date) queue7 done" >> /tmp/r4_queue7.log
