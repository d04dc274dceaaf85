#!/bin/bash
# Round-4 TPU queue #9 (post-restart; both jax caches wiped): the HBM-wall
# posture run that queue #8 scheduled but the machine restart ate.
#   1. 160M, 600 steps, recovery armed — Session auto-picks the segmented
#      driver + two-kernel tail past ~152M (segmented_run_default).
#   2. 176M probe if 160M runs clean.
#   3. bench.py (flagship 1M differential) to repopulate the TPU compile
#      cache before the driver's end-of-round bench run.
cd /root/repo

echo "=== $(date) 160M (segmented + two-kernel tail)" >> /tmp/r4_queue9.log
timeout 7200 python tools/bench_scale.py --n 160000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/scale160.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue9.log

if [ $rc -eq 0 ]; then
  echo "=== $(date) 176M probe" >> /tmp/r4_queue9.log
  timeout 5400 python tools/bench_scale.py --n 176000000 --warmup-steps 0 \
      --bisect 150 --steps 600 --reps 1 > /tmp/scale176.log 2>&1
  echo "176M exit=$?" >> /tmp/r4_queue9.log
fi

echo "=== $(date) bench.py cache warm" >> /tmp/r4_queue9.log
timeout 3600 python bench.py > /tmp/bench_r4_warm.log 2>&1
echo "bench exit=$?" >> /tmp/r4_queue9.log
echo "=== $(date) queue9 done" >> /tmp/r4_queue9.log
