#!/bin/bash
# Round-4 TPU queue #10: 160M retry with the density rho_out alias (the
# first 160M attempt RESOURCE_EXHAUSTed at the first segmented dispatch:
# 8 carry planes + rho + ax + ay = 15.2 of 15.75 GiB; the alias sheds the
# rho temp -> ~13.8 GiB). Then a 176M probe (expected marginal: 10-plane
# peak = ~16.3 GiB > wall — a fault there brackets the ceiling).
cd /root/repo

echo "=== $(date) 160M retry (rho alias)" >> /tmp/r4_queue10.log
timeout 7200 python tools/bench_scale.py --n 160000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/scale160b.log 2>&1
rc=$?
echo "160M exit=$rc" >> /tmp/r4_queue10.log

echo "=== $(date) 176M probe" >> /tmp/r4_queue10.log
timeout 5400 python tools/bench_scale.py --n 176000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/scale176.log 2>&1
echo "176M exit=$?" >> /tmp/r4_queue10.log
echo "=== $(date) queue10 done" >> /tmp/r4_queue10.log
