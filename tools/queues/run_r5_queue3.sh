#!/bin/bash
# Round-5 TPU queue #3: the 160M design point with the REFLESS trigger
# (auto past ~150M): step peak 11.04 GiB, planar-rebin peak ~12.8 —
# under the allocator wall the ref-based posture hit at 13.81.
# probe first: documents the refless accounting AND warms the exact
# program cache so the long-timeout jobs can't be killed mid-claim.
cd /root/repo

echo "=== $(date) probe_hbm 160M (refless)" >> /tmp/r5_queue3.log
timeout 7200 python tools/probe_hbm.py --n 160000000 > /tmp/r5_probe160b.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue3.log

echo "=== $(date) 160M refless" >> /tmp/r5_queue3.log
timeout 21600 python tools/bench_scale.py --n 160000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale160b.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue3.log

echo "=== $(date) 176M refless" >> /tmp/r5_queue3.log
timeout 14400 python tools/bench_scale.py --n 176000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale176b.log 2>&1
echo "176M exit=$?" >> /tmp/r5_queue3.log
echo "=== $(date) queue3 done" >> /tmp/r5_queue3.log
