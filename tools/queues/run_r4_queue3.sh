#!/bin/bash
# Round-4 TPU queue #3: waits for queue #2, then probes the tb=4 widths.
cd /root/repo
while ! grep -q "queue2 done" /tmp/r4_queue2.log 2>/dev/null; do sleep 60; done

echo "=== $(date) probe_vmem (compile-only calibration of the tb=4 model)" >> /tmp/r4_queue3.log
timeout 5400 python tools/probe_vmem.py > /tmp/probe_vmem.log 2>&1
echo "probe exit=$?" >> /tmp/r4_queue3.log

echo "=== $(date) 160M (tb=4, chunked)" >> /tmp/r4_queue3.log
timeout 9000 python tools/bench_scale.py --n 160000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale160.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue3.log

if [ $rc -ne 0 ]; then
  echo "=== $(date) 144M fallback (tb=4, chunked)" >> /tmp/r4_queue3.log
  timeout 9000 python tools/bench_scale.py --n 144000000 --warmup-steps 0 --bisect 150 \
      --steps 600 --reps 1 > /tmp/scale144.log 2>&1
  echo "144M exit=$?" >> /tmp/r4_queue3.log
fi
echo "=== $(date) queue3 done" >> /tmp/r4_queue3.log
