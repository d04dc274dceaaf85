#!/bin/bash
# Round-5 TPU queue #2 (after queue1's 160M RESOURCE_EXHAUSTED):
# 1. probe_hbm at 160M — compile-only accounting of the segmented posture
#    programs (step_until / rebin_one): did the rho_out alias engage, and
#    what are the real TEMP sizes vs the 13.8 GiB expectation?
# 2. pair-loop lowering A/B at 1M (VERDICT r5 #4): fori vs unroll vs
#    bucket (a bucket lowering failure is itself a result).
# 3. sharded-scale D=1 at 96M/device (VERDICT r5 #3 done-criterion):
#    ShardedSession posture knobs, 600 steps through rebins, chunked
#    dispatches, on-device identity check.
cd /root/repo

echo "=== $(date) probe_hbm 160M" >> /tmp/r5_queue2.log
timeout 7200 python tools/probe_hbm.py --n 160000000 > /tmp/r5_probe160.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue2.log

echo "=== $(date) pairloop A/B" >> /tmp/r5_queue2.log
timeout 14400 python tools/exp_pairloop.py --modes fori,unroll,bucket \
    > /tmp/r5_pairloop.log 2>&1
echo "pairloop exit=$?" >> /tmp/r5_queue2.log

echo "=== $(date) sharded scale 96M D=1" >> /tmp/r5_queue2.log
timeout 21600 python tools/bench_sharded.py --scale --n 96000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --steps 600 --reps 1 --chunk 150 > /tmp/r5_shscale96.log 2>&1
echo "sharded96 exit=$?" >> /tmp/r5_queue2.log
echo "=== $(date) queue2 done" >> /tmp/r5_queue2.log
