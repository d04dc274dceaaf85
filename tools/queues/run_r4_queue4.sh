#!/bin/bash
# Round-4 TPU queue #4: retry the >136M widths with the tb=4 rebin fix
# (2b73de7) and the donated-init peak reduction (4996e53) in place.
cd /root/repo

echo "=== $(date) 144M (tb=4, chunked, donated init)" >> /tmp/r4_queue4.log
timeout 9000 python tools/bench_scale.py --n 144000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale144_b.log 2>&1
rc=$?
echo "144M exit=$rc" >> /tmp/r4_queue4.log

if [ $rc -eq 0 ]; then
  echo "=== $(date) 160M (tb=4, chunked, donated init)" >> /tmp/r4_queue4.log
  timeout 9000 python tools/bench_scale.py --n 160000000 --warmup-steps 0 --bisect 150 \
      --steps 600 --reps 1 > /tmp/scale160_b.log 2>&1
  echo "160M exit=$?" >> /tmp/r4_queue4.log
fi
echo "=== $(date) queue4 done" >> /tmp/r4_queue4.log
