#!/bin/bash
# Round-4 TPU queue #8: FPS table with the batched run_frames mode, then
# 160M with the HBM-wall posture (segmented driver + two-kernel tail,
# auto-selected by Session past ~152M), then 176M if 160M runs clean.
cd /root/repo

echo "=== $(date) fps (batched mode)" >> /tmp/r4_queue8.log
timeout 3600 python bench.py --fps > /tmp/fps_r4b.log 2>&1
echo "fps exit=$?" >> /tmp/r4_queue8.log

echo "=== $(date) 160M (segmented + unfused tail)" >> /tmp/r4_queue8.log
timeout 10800 python tools/bench_scale.py --n 160000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale160_d.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue8.log

if [ $rc -eq 0 ]; then
  echo "=== $(date) 176M probe" >> /tmp/r4_queue8.log
  timeout 10800 python tools/bench_scale.py --n 176000000 --warmup-steps 0 --bisect 150 \
      --steps 600 --reps 1 > /tmp/scale176.log 2>&1
  echo "176M exit=$?" >> /tmp/r4_queue8.log
fi
echo "=== $(date) queue8 done" >> /tmp/r4_queue8.log
