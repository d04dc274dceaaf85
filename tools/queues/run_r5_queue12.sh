#!/bin/bash
# Round-5 TPU queue #12: attribute the sharded 128M/device 582 ms/step
# anomaly (the 96M point scales to ~220; the fair idle-box read was
# 2.6x that).
#   1. 96M/device re-read on CURRENT code (was 166.4 ms in the early-r5
#      queue 2): a slow read here = code regression since then; a fast
#      one isolates a 96->128M cliff.
#   2. 128M/device with the refless trigger FORCED ON (sheds the 2 ref
#      planes = 2.2 GiB): tests the HBM-pressure hypothesis (the
#      ref-based 8-plane scan carry + rebin-cond temps crowd the
#      allocator at 128M/device and the scheduler serializes to fit).
#   3. 128M/device refless re-read (second rep for noise).
cd /root/repo

echo "=== $(date) sharded 96M/device re-read" >> /tmp/r5_queue12.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 96000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard96b.log 2>&1
echo "96M exit=$?" >> /tmp/r5_queue12.log

echo "=== $(date) sharded 128M/device refless ON" >> /tmp/r5_queue12.log
timeout 14400 python tools/bench_sharded.py --scale --gen --n 128000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 2 --refless on > /tmp/r5_shard128g.log 2>&1
echo "128M-refless exit=$?" >> /tmp/r5_queue12.log
echo "=== $(date) queue12 done" >> /tmp/r5_queue12.log
