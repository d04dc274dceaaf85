#!/bin/bash
# Round-5 TPU queue #4: continue the refless ceiling march past 176M.
# 192M refless step peak ~13.25 GiB (8 x 1.656 GiB planes) — inside the
# anomaly band where the ref-based 13.81 GiB step faulted; a fault here
# brackets the refless ceiling at 176M, a pass moves it again.
cd /root/repo

echo "=== $(date) 192M refless" >> /tmp/r5_queue4.log
timeout 21600 python tools/bench_scale.py --n 192000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale192.log 2>&1
echo "192M exit=$?" >> /tmp/r5_queue4.log

echo "=== $(date) queue4 done" >> /tmp/r5_queue4.log
