#!/bin/bash
# Round-5 TPU queue #8: the rotated rebin with plane-sized temps shed
# (3D drop gathers — no [total] relayout copies; fori'd taken_mask).
#   1. probe_hbm 192M — expect rebin TEMP well under the 7.27 GiB the
#      queue-7 probe measured (peak must clear the ~13.8-15 GiB arena).
#   2. 192M refless run (queue-4 design point, third attempt).
#   3. sharded 128M/device --gen rerun (jit'd diagnostics).
#   4. sharded 160M/device --gen — now auto-selects the sharded
#      SEGMENTED driver + rotated rebin (the queue-6 step-program OOM).
# Waits for the queue-7 jobs to drain first (exclusive TPU claim).
cd /root/repo
while ! grep -q "queue7 done" /tmp/r5_queue7.log 2>/dev/null; do sleep 30; done

echo "=== $(date) probe_hbm 192M (temps shed)" >> /tmp/r5_queue8.log
timeout 7200 python tools/probe_hbm.py --n 192000000 > /tmp/r5_probe192c.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue8.log

echo "=== $(date) 192M refless" >> /tmp/r5_queue8.log
timeout 21600 python tools/bench_scale.py --n 192000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale192d.log 2>&1
echo "192M exit=$?" >> /tmp/r5_queue8.log

if grep -q '"ok": true' /tmp/r5_shard128c.log 2>/dev/null; then
    echo "128M already clean in queue 7 - skipped" >> /tmp/r5_queue8.log
else
    echo "=== $(date) sharded 128M/device D=1 (--gen)" >> /tmp/r5_queue8.log
    timeout 21600 python tools/bench_sharded.py --scale --gen --n 128000000 \
        --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
        --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard128d.log 2>&1
    echo "128M exit=$?" >> /tmp/r5_queue8.log
fi

echo "=== $(date) sharded 160M/device D=1 (--gen, segmented)" >> /tmp/r5_queue8.log
timeout 21600 python tools/bench_sharded.py --scale --gen --n 160000000 \
    --devices 1 --capacity-factor 1.0 --chunks 16 --warmup-steps 0 \
    --chunk 150 --steps 600 --reps 1 > /tmp/r5_shard160d.log 2>&1
echo "160M exit=$?" >> /tmp/r5_queue8.log
echo "=== $(date) queue8 done" >> /tmp/r5_queue8.log
