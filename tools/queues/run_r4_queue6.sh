#!/bin/bash
# Round-4 TPU queue #6: waits for queue #5, then retries 160M with the
# generator init (5ab3f3c - no [N] planes on device), and probes 176M if
# 160M runs clean.
cd /root/repo
while ! grep -q "queue5 done" /tmp/r4_queue5.log 2>/dev/null; do sleep 60; done

echo "=== $(date) 160M (generator init)" >> /tmp/r4_queue6.log
timeout 9000 python tools/bench_scale.py --n 160000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale160_c.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue6.log

if [ $rc -eq 0 ]; then
  echo "=== $(date) 176M probe (generator init)" >> /tmp/r4_queue6.log
  timeout 9000 python tools/bench_scale.py --n 176000000 --warmup-steps 0 --bisect 150 \
      --steps 600 --reps 1 > /tmp/scale176.log 2>&1
  echo "176M exit=$?" >> /tmp/r4_queue6.log
fi
echo "=== $(date) queue6 done" >> /tmp/r4_queue6.log
